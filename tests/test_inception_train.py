"""Fine-tune building blocks: train-mode BN context, optimizer masking,
on-device RandomResizedCrop+flip (CPU-sized; the full fine-tune loop is
driven on TPU — see .claude/skills/verify)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from jckx.data.augment import random_resized_crop_flip
from jckx.metrics import inception_v3
from jckx.metrics.inception_train import make_optimizer


def test_bconv_train_mode_matches_torch_bn():
    """_bconv_apply under _BNCtx = conv + torch train-mode BN + relu,
    and the running-stat update matches torch's momentum-0.1 rule."""
    rng = np.random.RandomState(0)
    p = {
        "w": rng.randn(3, 3, 4, 5).astype(np.float32) * 0.1,
        "bn_scale": rng.rand(5).astype(np.float32) + 0.5,
        "bn_bias": rng.randn(5).astype(np.float32),
        "bn_mean": rng.randn(5).astype(np.float32),
        "bn_var": (rng.rand(5).astype(np.float32) + 0.5),
    }
    x = rng.randn(4, 8, 8, 4).astype(np.float32)

    inception_v3._bn_ctx = inception_v3._BNCtx(momentum=0.1)
    try:
        pj = {k: jnp.asarray(v) for k, v in p.items()}
        y = np.asarray(inception_v3._bconv_apply(pj, jnp.asarray(x), padding=1))
        # updates are keyed by id(pj) — grab the only entry
        (new_mean, new_var) = list(inception_v3._bn_ctx.updates.values())[0]
    finally:
        inception_v3._bn_ctx = None

    conv = torch.nn.functional.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(p["w"].transpose(3, 2, 0, 1)), padding=1)
    bn = torch.nn.BatchNorm2d(5, eps=1e-3, momentum=0.1)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(p["bn_scale"]))
        bn.bias.copy_(torch.from_numpy(p["bn_bias"]))
        bn.running_mean.copy_(torch.from_numpy(p["bn_mean"]))
        bn.running_var.copy_(torch.from_numpy(p["bn_var"]))
    bn.train()
    ref = torch.relu(bn(conv)).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(y, ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(new_mean), bn.running_mean.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_var), bn.running_var.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_optimizer_masks_bn_buffers():
    tx = make_optimizer(lr=0.1, weight_decay=0.1, momentum=0.0, nesterov=False)
    params = {
        "blk": {
            "w": jnp.ones((3,)),
            "bn_scale": jnp.ones((3,)),
            "bn_mean": jnp.full((3,), 5.0),
            "bn_var": jnp.full((3,), 7.0),
        }
    }
    st = tx.init(params)
    zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    upd, _ = tx.update(zero_grads, st, params)
    import optax

    new = optax.apply_updates(params, upd)
    # wd decays weights and BN affine (torch parameters)…
    assert float(new["blk"]["w"][0]) < 1.0
    assert float(new["blk"]["bn_scale"][0]) < 1.0
    # …but never the running-stat buffers
    assert float(new["blk"]["bn_mean"][0]) == 5.0
    assert float(new["blk"]["bn_var"][0]) == 7.0


def test_random_resized_crop_flip():
    key = jax.random.PRNGKey(0)
    imgs = jnp.asarray(np.random.RandomState(1).rand(4, 32, 32, 3).astype(np.float32))
    out = random_resized_crop_flip(key, imgs, out_size=48)
    assert out.shape == (4, 48, 48, 3)
    assert np.isfinite(np.asarray(out)).all()
    # deterministic under the same key, different under another
    out2 = random_resized_crop_flip(key, imgs, out_size=48)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = random_resized_crop_flip(jax.random.PRNGKey(1), imgs, out_size=48)
    assert np.abs(np.asarray(out) - np.asarray(out3)).max() > 1e-3
    # values stay in range (bilinear of [0,1])
    assert float(out.min()) >= -1e-3 and float(out.max()) <= 1.0 + 1e-3


def test_evaluate_with_cached_device_set():
    """evaluate() with a pre-uploaded padded device set (per-epoch reuse)
    matches the upload-per-call path."""
    from jckx.metrics.inception_train import evaluate, eval_device_set

    rng = np.random.RandomState(3)
    imgs = rng.randint(0, 255, size=(10, 8, 8, 3), dtype=np.uint8)
    labels = rng.randint(0, 100, size=(10,))

    @jax.jit
    def tiny_logits(params, u8):
        x = u8.astype(jnp.float32) / 255.0
        return jnp.stack([x.mean((1, 2, 3)) * (i + 1) for i in range(100)], -1)

    a = evaluate(None, tiny_logits, imgs, labels, batch_size=4)
    dev = eval_device_set(imgs, batch_size=4)
    assert dev.shape[0] == 12  # padded to the batch multiple
    b = evaluate(None, tiny_logits, imgs, labels, batch_size=4, device_images=dev)
    assert a == b


def test_finetune_superstep_sharded_matches_single():
    """Data-parallel fine-tune (--mesh_shape) ≡ single-device: batch index
    matrix sharded on 'data', params replicated, BN batch stats and grads
    globally reduced by XLA (sync-BN) — same recipe as the GAN trainers."""
    from jckx.metrics.inception_train import make_superstep, make_train_step
    from jckx.parallel import make_mesh

    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randint(0, 255, (64, 32, 32, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.randint(0, 10, (64,)).astype(np.int32))
    idx = jnp.asarray(rng.randint(0, 64, (1, 8)).astype(np.int32))
    key = jax.random.PRNGKey(3)

    w0 = np.asarray(inception_v3.init(0, num_classes=10)["Conv2d_1a_3x3"]["w"])

    def run(mesh):
        params = inception_v3.init(0, num_classes=10)
        _, tx, raw = make_train_step(0.1, 5e-4, compute_dtype=jnp.float32,
                                     image_size=75)
        sstep = make_superstep(raw, mesh=mesh)
        opt = tx.init(params)
        p, o, losses, accs = sstep(params, opt, data, labels, idx, key)
        return (float(losses[0]), np.asarray(jax.device_get(p["Conv2d_1a_3x3"]["w"])),
                np.asarray(jax.device_get(p["fc"]["w"])))

    loss_1, w_1, fc_1 = run(None)
    loss_8, w_8, fc_8 = run(make_mesh())  # all 8 virtual CPU devices on 'data'
    # forward semantics identical (global batch stats ≡ one device)
    assert abs(loss_1 - loss_8) < 1e-4 * max(1.0, abs(loss_1))
    # fc has a shallow backward path → agreement to reorder-noise level
    # (cross-layout reduction order shifts f32 sums by ~1e-4 absolute)
    np.testing.assert_allclose(fc_1, fc_8, rtol=5e-2, atol=5e-4)
    # the stem's backward runs through ~90 BN+ReLU layers: cross-layout
    # reduction reorder flips ReLU boundaries, so compare update vectors by
    # norm, not elementwise (exact parity is unattainable at this depth in
    # f32; the shallow GAN nets ARE tested elementwise in test_train_step)
    diff = np.linalg.norm(w_1 - w_8)
    update = np.linalg.norm(w_1 - w0)
    assert update > 0 and diff / update < 0.1, (diff, update)


def test_synthetic_size_flag_reference_protocol():
    """--synthetic_size 50000 reproduces the reference data protocol on the
    synthetic fallback: 50k train / 10k test (CIFAR proportions), 390 full
    batches per epoch (inceptionnet.ipynb cell 14's 391it loop, drop-last)."""
    from jckx.data.datasets import load_dataset
    from jckx.metrics.inception_train import get_args

    a = get_args(["--dataset", "synthetic", "--synthetic_size", "1000"])
    assert a.synthetic_size == 1000
    x, y, ncls, _, syn = load_dataset(a.dataset, a.data_dir, train=True,
                                      seed=a.seed, synthetic_n=a.synthetic_size)
    xt, yt, _, _, _ = load_dataset(a.dataset, a.data_dir, train=False,
                                   seed=a.seed + 1,
                                   synthetic_n=a.synthetic_size // 5)
    assert syn and x.shape == (1000, 32, 32, 3) and xt.shape == (200, 32, 32, 3)
    assert ncls == 100 and y.dtype == np.int32


def test_train_end_to_end_tiny(tmp_path):
    """Full train() loop on CPU: tiny synthetic set, 2 epochs, 75² input.
    Covers the epoch loop, eval, best-checkpoint selection, early-stop
    bookkeeping, and the provenance sidecar (the notebook cell-14 flow)."""
    import json

    from jckx.metrics.inception_train import get_args, train

    save = tmp_path / "bk"
    args = get_args([
        "--dataset", "synthetic", "--synthetic_size", "64",
        "-b", "16", "-e", "2", "--image_size", "75",
        "-mlr", "0.01",  # notebook lr .1 diverges at this toy scale
        "--eval_samples", "16", "--scan_steps", "4",
        "--save_dir", str(save), "--save_path", str(tmp_path),
    ])
    best_acc, best_loss = train(args)
    assert 0.0 <= best_acc <= 1.0
    assert np.isfinite(best_loss) and best_loss < 1e9  # a real eval improved it
    for f in ("loss_bset.npz", "last_bset.npz", "summary.json"):
        assert (save / f).exists(), f
    # acc_bset saves only on strict top-1 improvement over the 0.0 seed
    # (reference cell-14 semantics) — at this toy scale top-1 may stay 0
    if best_acc > 0:
        assert (save / "acc_bset.npz").exists()
    side = json.loads((save / "summary.json").read_text())
    assert side["epochs_run"] == 2 and side["synthetic_fallback"] is True
    assert side["batch_size"] == 16 and side["best_top1"] == best_acc
    # eval ran at the train-side image_size (test hook; 299 = parity default)


def test_resume_matches_uninterrupted(tmp_path):
    """2 epochs + --resume for 1 more ≡ 3 epochs straight: the saved
    optimizer traces, PRNG key chain, and shuffle fast-forward reproduce
    the uninterrupted trajectory bit-for-bit (GAN-trainer resume parity
    for the backbone trainer)."""
    from jckx.metrics.inception_train import get_args, train

    def run(save, epochs, resume=0):
        args = get_args([
            "--dataset", "synthetic", "--synthetic_size", "32",
            "-b", "8", "-e", str(epochs), "--image_size", "75",
            "-mlr", "0.01", "--eval_samples", "8", "--scan_steps", "2",
            "--resume", str(resume),
            "--save_dir", str(save), "--save_path", str(tmp_path),
        ])
        return train(args)

    a, b = tmp_path / "straight", tmp_path / "resumed"
    run(a, 3)
    run(b, 2)
    run(b, 3, resume=1)

    za = np.load(a / "last_bset.npz")
    zb = np.load(b / "last_bset.npz")
    assert set(za.files) == set(zb.files)
    for k in za.files:
        np.testing.assert_array_equal(za[k], zb[k], err_msg=k)


def test_resume_legacy_state_without_params(tmp_path):
    """A pre-atomic train_state.npz (no p:: params inside) still resumes:
    params fall back to last_bset.npz."""
    from jckx.checkpoint import flush_writes
    from jckx.metrics.inception_train import get_args, train

    save = tmp_path / "bk"
    args = lambda e, r=0: get_args([
        "--dataset", "synthetic", "--synthetic_size", "32",
        "-b", "8", "-e", str(e), "--image_size", "75",
        "-mlr", "0.01", "--eval_samples", "8", "--scan_steps", "2",
        "--resume", str(r), "--save_dir", str(save), "--save_path", str(tmp_path),
    ])
    train(args(1))
    flush_writes()
    sp = save / "train_state.npz"
    z = dict(np.load(sp))
    legacy = {k: v for k, v in z.items() if not k.startswith("p::")}
    with open(sp, "wb") as f:
        np.savez_compressed(f, **legacy)
    best_acc, best_loss = train(args(2, r=1))
    assert np.isfinite(best_loss) and best_loss < 1e9


def test_train_on_custom_npz_with_holdout(tmp_path):
    """--dataset npz fine-tune: the class count comes from the data, and
    with no --valid_data_path a seeded 10% holdout becomes the valid split
    (custom planes have no train/test convention to read)."""
    import json

    from jckx.metrics.inception_train import get_args, train

    rng = np.random.RandomState(5)
    p = str(tmp_path / "custom.npz")
    with open(p, "wb") as f:
        np.savez(f, x=rng.randint(0, 256, (40, 32, 32, 3)).astype(np.uint8),
                 y=rng.randint(0, 4, 40))
    save = tmp_path / "bk"
    args = get_args([
        "--dataset", "npz", "--data_path", p,
        "-b", "8", "-e", "1", "--image_size", "75", "-mlr", "0.01",
        "--eval_samples", "8", "--scan_steps", "2",
        "--save_dir", str(save), "--save_path", str(tmp_path),
    ])
    best_acc, best_loss = train(args)
    assert np.isfinite(best_loss)
    assert (save / "loss_bset.npz").exists()
    side = json.loads((save / "summary.json").read_text())
    assert side["synthetic_fallback"] is False
    # 4-class head: the saved fc weights must be (2048, 4)
    with np.load(save / "loss_bset.npz") as z:
        fc = z["fc/w"]  # flatten_params '/'-joins the pytree keys
    assert fc.shape == (2048, 4)
