"""Import / export the reference's torch GAN checkpoints.

The reference trainer checkpoints ``torch.save({'model_g': G.state_dict(),
'model_d': D.state_dict(), 'optimizer_g': opt_g.state_dict(),
'optimizer_d': opt_d.state_dict()})`` (train/dcgan_trainer.py:86-91,
train/cgan_trainer.py:82-87) — and its own resume path is commented out
(dcgan_trainer.py:103-111), so those files are otherwise write-only. This
module makes them live: a reference user can bring a trained ``.pt`` and

- **serve it** (``python -m jckx.serve --ckpt path/to/1234_0.1_88.4.pt``),
- **evaluate it** (FID/IS through the jckx metrics stack), or
- **continue training it** (``python main.py --init_from_torch <pt>``),
  Adam first/second moments and the bias-correction step included, so the
  optimizer picks up exactly where the reference's left off.

Layout mapping (the inverse of tests/test_model_torch_parity.py):

- Conv2d      OIHW           → HWIO                transpose(2, 3, 1, 0)
- ConvTrans2d (Cin,Cout,k,k) → (k, k, Cin, Cout)   transpose(2, 3, 0, 1)
- Linear      (out, in)      → (in, out)           .T
- BatchNorm   weight/bias    → bn*_scale / bn*_bias (running_mean /
  running_var / num_batches_tracked are DROPPED: the reference never calls
  .eval() on the GAN nets, so train-mode batch statistics — what jckx always
  computes — are the only statistics that ever affected its behavior; see
  PARITY.md)
- CGAN D fc1: the reference flattens NCHW (C,H,W row order,
  model/CGAN.py:112,120) while jckx flattens NHWC — the image block of
  fc1's weight rows is permuted between the two orders so both nets compute
  the same function.

Export produces state_dicts the reference's own modules accept with
``load_state_dict(strict=True)`` (fresh BN running stats, matching the
never-read values of a newly constructed torch module) — the escape hatch
back to the reference stack.

Geometry, conditionality, and num_classes are inferred from weight shapes
(``infer_gan_config``): the CGAN discriminator is recognized by its
``linear1``/``label_embedding`` head, K from the label embedding, z_dim
from G's first conv input minus K, image size from the layer count.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import numpy as np
import optax

from jckx.models.dcgan import GANGeometry
from jckx.rng import RANDOMSEED

Params = Dict[str, jax.Array]

# One mapping entry per torch PARAMETER, listed in ``Module.parameters()``
# order (= attribute registration order in the reference classes), so the
# list index doubles as the torch optimizer's param-state key.
# (torch_key, jckx_key, torch→jckx fn, jckx→torch fn)
MapEntry = Tuple[str, str, Callable[[np.ndarray], np.ndarray],
                 Callable[[np.ndarray], np.ndarray]]


def _np(t) -> np.ndarray:
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _conv_t2j(w):   # OIHW -> HWIO
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _conv_j2t(w):   # HWIO -> OIHW
    return np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1)))


def _convt_t2j(w):  # (Cin,Cout,kh,kw) -> (kh,kw,Cin,Cout); self-inverse perm
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))


def _lin_t2j(w):    # (out,in) -> (in,out)
    return np.ascontiguousarray(np.asarray(w).T)


def _ident(w):
    return np.asarray(w)


def _generator_map(geo: GANGeometry) -> List[MapEntry]:
    """Reference G = conv1..conv{n+1} (ConvTranspose2d) with norm1..norm{n}
    between (model/DCGAN.py:38-67 / CGAN.py:126-162)."""
    entries: List[MapEntry] = []
    for i in range(geo.n_up):
        entries.append((f"conv{i + 1}.weight", f"convt{i}", _convt_t2j, _convt_t2j))
        entries.append((f"norm{i + 1}.weight", f"bn{i}_scale", _ident, _ident))
        entries.append((f"norm{i + 1}.bias", f"bn{i}_bias", _ident, _ident))
    entries.append((f"conv{geo.n_up + 1}.weight", "convt_out", _convt_t2j, _convt_t2j))
    return entries


def _disc_conv_entries(geo: GANGeometry) -> List[MapEntry]:
    entries: List[MapEntry] = []
    for i in range(geo.n_up):
        entries.append((f"conv{i + 1}.weight", f"conv{i}", _conv_t2j, _conv_j2t))
        entries.append((f"norm{i + 1}.weight", f"bn{i}_scale", _ident, _ident))
        entries.append((f"norm{i + 1}.bias", f"bn{i}_bias", _ident, _ident))
    return entries


def _discriminator_map(geo: GANGeometry) -> List[MapEntry]:
    """Reference DCGAN D = conv1..conv{n} + norms + conv{n+1} head
    (model/DCGAN.py:6-35)."""
    return _disc_conv_entries(geo) + [
        (f"conv{geo.n_up + 1}.weight", "conv_out", _conv_t2j, _conv_j2t)
    ]


def _fc1_t2j(geo: GANGeometry):
    """torch linear1.weight (256, flat+emb) → jckx fc1_w (flat+emb, 256)
    with the image block re-rowed from C,H,W to H,W,C flatten order."""
    s = geo.image_size // (2 ** geo.n_up)           # spatial after the trunk (4)
    c = geo.base_width * 2 ** (geo.n_up - 1)        # trunk output channels (512)
    flat = s * s * c

    def fn(w):
        wt = np.asarray(w).T                        # (flat+emb, 256)
        img = wt[:flat].reshape(c, s, s, -1)        # rows were (C,H,W)
        img = img.transpose(1, 2, 0, 3).reshape(flat, -1)
        return np.ascontiguousarray(np.concatenate([img, wt[flat:]], axis=0))

    return fn


def _fc1_j2t(geo: GANGeometry):
    s = geo.image_size // (2 ** geo.n_up)
    c = geo.base_width * 2 ** (geo.n_up - 1)
    flat = s * s * c

    def fn(w):
        img = np.asarray(w)[:flat].reshape(s, s, c, -1)  # rows are (H,W,C)
        img = img.transpose(2, 0, 1, 3).reshape(flat, -1)
        full = np.concatenate([img, np.asarray(w)[flat:]], axis=0)
        return np.ascontiguousarray(full.T)

    return fn


def _cdiscriminator_map(geo: GANGeometry, num_classes: int) -> List[MapEntry]:
    """Reference CGAN D (model/CGAN.py:79-124): label_embedding first
    (registration order), conv trunk, then linear1/linear2 head."""
    return (
        [
            ("label_embedding.weight", "label_w", _lin_t2j, _lin_t2j),
            ("label_embedding.bias", "label_b", _ident, _ident),
        ]
        + _disc_conv_entries(geo)
        + [
            ("linear1.weight", "fc1_w", _fc1_t2j(geo), _fc1_j2t(geo)),
            ("linear1.bias", "fc1_b", _ident, _ident),
            ("linear2.weight", "fc2_w", _lin_t2j, _lin_t2j),
            ("linear2.bias", "fc2_b", _ident, _ident),
        ]
    )


# ------------------------------------------------------------------ inference

def infer_gan_config(model_g_sd: Dict[str, Any],
                     model_d_sd: Dict[str, Any]) -> Tuple[bool, GANGeometry, int]:
    """(conditional, geometry, num_classes) from a checkpoint's weight shapes.

    The reference's checkpoints carry no config; everything needed is
    recoverable: the CGAN head announces itself by ``linear1`` keys, K by the
    label embedding's output width (Linear(K → 2K), model/CGAN.py:83), the
    layer count gives the image size, G's first conv gives z(+K), the
    second-to-last G conv gives base_width, the last gives channels.
    """
    conditional = any(k.startswith("linear1.") for k in model_d_sd)
    n_layers = len({k for k in model_g_sd if k.startswith("conv")})
    n_up = n_layers - 1
    image_size = 2 ** (n_up + 2)
    g_first = _np(model_g_sd["conv1.weight"])          # (Cin, 512, 4, 4)
    g_last = _np(model_g_sd[f"conv{n_layers}.weight"])  # (64, C, 4, 4)
    base_width = g_last.shape[0]
    channels = g_last.shape[1]
    if conditional:
        num_classes = _np(model_d_sd["label_embedding.weight"]).shape[1]
        z_dim = g_first.shape[0] - num_classes
    else:
        num_classes = 100
        z_dim = g_first.shape[0]
    geo = GANGeometry(z_dim=z_dim, image_size=image_size,
                      channels=channels, base_width=base_width)
    return conditional, geo, num_classes


# -------------------------------------------------------------------- weights

_BUFFER_SUFFIXES = ("running_mean", "running_var", "num_batches_tracked")


def _check_keys(sd: Dict[str, Any], entries: List[MapEntry], what: str) -> None:
    want = {tk for tk, _, _, _ in entries}
    have = {k for k in sd if not k.endswith(_BUFFER_SUFFIXES)}
    if want - have:
        raise KeyError(f"{what}: missing torch keys {sorted(want - have)}")
    if have - want:
        raise KeyError(f"{what}: unrecognized torch keys {sorted(have - want)} "
                       f"(BN running stats are ignored, anything else is a "
                       f"geometry/architecture mismatch)")


def params_from_torch(sd: Dict[str, Any], entries: List[MapEntry],
                      what: str = "state_dict") -> Params:
    """Returns HOST numpy leaves (like flax from_bytes): eager per-leaf
    device_puts would cost one dispatch each (~0.4 s/leaf through a
    tunneled runtime); the first jit call uploads the whole tree batched."""
    _check_keys(sd, entries, what)
    return {jk: t2j(_np(sd[tk])) for tk, jk, t2j, _ in entries}


def params_to_torch(params: Params, entries: List[MapEntry],
                    with_bn_buffers: bool = True) -> Dict[str, np.ndarray]:
    """jckx params → reference-named state_dict (numpy values; callers that
    need tensors wrap with torch.from_numpy). BN buffers are emitted fresh
    (zero mean / unit var / 0 batches — identical to a newly constructed
    torch module, and never read by the reference's train-mode-only nets) so
    ``load_state_dict(strict=True)`` succeeds."""
    out: Dict[str, np.ndarray] = {}
    for tk, jk, _, j2t in entries:
        out[tk] = j2t(np.asarray(params[jk]))
        if with_bn_buffers and tk.startswith("norm") and tk.endswith(".weight"):
            prefix = tk[: -len(".weight")]
            n = out[tk].shape[0]
            out[f"{prefix}.running_mean"] = np.zeros((n,), np.float32)
            out[f"{prefix}.running_var"] = np.ones((n,), np.float32)
            out[f"{prefix}.num_batches_tracked"] = np.zeros((), np.int64)
    return out


# ------------------------------------------------------------------ optimizer

def _fill_adam(template_opt_state, mu: Params, nu: Params, count: int):
    def repl(s):
        if isinstance(s, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(
                count=np.asarray(count, np.int32), mu=mu, nu=nu)
        return s

    return jax.tree_util.tree_map(
        repl, template_opt_state,
        is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))


def adam_state_from_torch(opt_sd: Dict[str, Any], entries: List[MapEntry],
                          template_opt_state) -> Tuple[Any, int]:
    """torch Adam state_dict → optax adam state (+ the shared step count).

    torch keys its per-param state by index into ``parameters()`` order —
    exactly the order of ``entries``. Moments ride the same layout
    transforms as the weights (a transpose/permutation of the parameter is
    the same transpose/permutation of its moments). The reference never
    varies lr/betas per group, and steps all parameters every iteration, so
    the per-param ``step`` collapses to optax's single ``count``.
    """
    state = {int(k): v for k, v in opt_sd.get("state", {}).items()}
    if not state:
        return template_opt_state, 0
    count = _torch_adam_count(opt_sd)
    mu: Params = {}
    nu: Params = {}
    for i, (tk, jk, t2j, _) in enumerate(entries):
        if i not in state:
            raise KeyError(f"torch optimizer state missing param index {i} ({tk})")
        mu[jk] = t2j(_np(state[i]["exp_avg"]))
        nu[jk] = t2j(_np(state[i]["exp_avg_sq"]))
    return _fill_adam(template_opt_state, mu, nu, count), count


def _torch_adam_count(opt_sd: Dict[str, Any]) -> int:
    """The shared step count of a torch Adam state_dict (0 when untrained)."""
    state = opt_sd.get("state", {})
    if not state:
        return 0
    steps = {int(_np(v["step"]).reshape(())) for v in state.values()}
    if len(steps) != 1:
        raise ValueError(f"per-param Adam steps differ ({sorted(steps)}); "
                         f"cannot map onto optax's single count")
    return steps.pop()


def adam_state_to_torch(opt_state, entries: List[MapEntry], lr: float,
                        betas=(0.5, 0.999), eps: float = 1e-8) -> Dict[str, Any]:
    adam = None
    for s in jax.tree_util.tree_leaves(
            opt_state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState)):
        if isinstance(s, optax.ScaleByAdamState):
            adam = s
            break
    if adam is None:
        raise ValueError("no ScaleByAdamState found in the optax state")
    count = int(np.asarray(adam.count))
    state: Dict[int, Dict[str, Any]] = {}
    for i, (tk, jk, _, j2t) in enumerate(entries):
        state[i] = {
            "step": float(count),
            "exp_avg": j2t(np.asarray(adam.mu[jk])),
            "exp_avg_sq": j2t(np.asarray(adam.nu[jk])),
        }
    group = {"lr": lr, "betas": tuple(betas), "eps": eps, "weight_decay": 0,
             "amsgrad": False, "maximize": False, "foreach": None,
             "capturable": False, "differentiable": False, "fused": None,
             "params": list(range(len(entries)))}
    return {"state": state, "param_groups": [group]}


def _threefry2x32(key: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Threefry-2x32 (20 rounds) in pure numpy uint32 arithmetic — the hash
    behind jax's threefry PRNG. Bit-exact vs jax.random (pinned in
    tests/test_torch_convert.py::test_host_key_matches_jax_fold_in)."""
    rot = np.uint32([13, 15, 26, 6, 17, 29, 16, 24])
    with np.errstate(over="ignore"):  # uint32 wraparound is the cipher
        ks = [key[0], key[1], key[0] ^ key[1] ^ np.uint32(0x1BD11BDA)]
        x0 = (x[0] + ks[0]).astype(np.uint32)
        x1 = (x[1] + ks[1]).astype(np.uint32)

        def rotl(v, r):
            return ((v << r) | (v >> np.uint32(32 - int(r)))).astype(np.uint32)

        for block in range(5):
            for r in rot[(block % 2) * 4:(block % 2) * 4 + 4]:
                x0 = (x0 + x1).astype(np.uint32)
                x1 = rotl(x1, r) ^ x0
            x0 = (x0 + ks[(block + 1) % 3]).astype(np.uint32)
            x1 = (x1 + ks[(block + 2) % 3]
                  + np.uint32(block + 1)).astype(np.uint32)
    return np.array([x0, x1], np.uint32)


def _host_key(seed: int, fold: int) -> np.ndarray:
    """Seed-derived PRNG key as HOST numpy uint32, == np.asarray(
    jax.random.fold_in(jax.random.PRNGKey(seed), fold)).

    Computed entirely in numpy: importing a checkpoint must never dispatch
    to (or read from) the accelerator — and it cannot simply run on the
    'cpu' backend, because the production JAX_PLATFORMS=axon/tpu pin
    excludes cpu from the registered backends (jax.local_devices(
    backend="cpu") raises there; only the CPU-pinned test suite has it).
    The first jit uploads this key with the rest of the state."""
    key = _threefry2x32(np.uint32([seed >> 32 & 0xFFFFFFFF, seed & 0xFFFFFFFF]),
                        np.uint32([fold >> 32 & 0xFFFFFFFF, fold & 0xFFFFFFFF]))
    return np.asarray(key, np.uint32)


# ------------------------------------------------------------------ top level

def _maps_for(conditional: bool, geo: GANGeometry, num_classes: int):
    gmap = _generator_map(geo)
    dmap = (_cdiscriminator_map(geo, num_classes) if conditional
            else _discriminator_map(geo))
    return gmap, dmap


def import_torch_gan_checkpoint(src, *, lr: float = 2e-4, with_ema: bool = False,
                                seed: int = RANDOMSEED,
                                with_optimizer: bool = True):
    """Reference ``.pt`` checkpoint (path or already-loaded dict) →
    ``(GANTrainState, info)``.

    ``info`` = {conditional, geo, num_classes, step}. Conditionality and
    geometry are inferred from the weights. ``lr`` configures the optax
    transformation whose state template receives the torch moments (lr
    itself is not stored in either format's state). ``with_ema`` seeds the
    jckx EMA extension with a copy of G (the reference has no EMA — a fresh
    average is the only faithful start). The state's step is the Adam step
    count (the reference stores its iteration counter only in the
    checkpoint FILENAME, dcgan_trainer.py:91, which may not survive renames
    — the optimizer state is authoritative). ``with_optimizer=False`` skips
    the moment import and template init (opt_g/opt_d = None) — serving and
    eval never touch them, and the template init allocates on the default
    device. All array leaves are HOST numpy; the first jit uploads them
    batched.
    """
    from jckx.configs import Config
    from jckx.train.state import GANTrainState, make_optimizer

    if isinstance(src, (str, bytes)):
        import torch

        src = torch.load(src, map_location="cpu")
    for k in ("model_g", "model_d"):
        if k not in src:
            raise KeyError(f"not a reference GAN checkpoint: missing '{k}' "
                           f"(have {sorted(src)})")
    conditional, geo, num_classes = infer_gan_config(src["model_g"], src["model_d"])
    gmap, dmap = _maps_for(conditional, geo, num_classes)
    params_g = params_from_torch(src["model_g"], gmap, "model_g")
    params_d = params_from_torch(src["model_d"], dmap, "model_d")

    if with_optimizer:
        cfg = Config()
        cfg.max_learning_rate = lr
        tx = make_optimizer(cfg)
        opt_g, step_g = adam_state_from_torch(
            src.get("optimizer_g", {}), gmap, tx.init(params_g))
        opt_d, _ = adam_state_from_torch(
            src.get("optimizer_d", {}), dmap, tx.init(params_d))
    else:
        opt_g = opt_d = None
        step_g = _torch_adam_count(src.get("optimizer_g", {}))

    state = GANTrainState(
        params_g=params_g, params_d=params_d, opt_g=opt_g, opt_d=opt_d,
        step=np.asarray(step_g, np.int32),
        rng=_host_key(seed, step_g),
        ema_g=jax.tree_util.tree_map(np.copy, params_g) if with_ema else None,
    )
    info = {"conditional": conditional, "geo": geo,
            "num_classes": num_classes, "step": step_g}
    return state, info


def export_torch_gan_checkpoint(state, *, conditional: bool, geo: GANGeometry,
                                num_classes: int = 100, lr: float = 2e-4,
                                path: Optional[str] = None,
                                use_ema: bool = False) -> Dict[str, Any]:
    """jckx ``GANTrainState`` → the reference's checkpoint dict
    (``torch.save``d to ``path`` when given). ``use_ema`` exports the EMA
    generator in G's slot (what serving would sample from)."""
    gmap, dmap = _maps_for(conditional, geo, num_classes)
    pg = state.ema_g if (use_ema and state.ema_g is not None) else state.params_g
    out = {
        "model_g": params_to_torch(pg, gmap),
        "model_d": params_to_torch(state.params_d, dmap),
        "optimizer_g": adam_state_to_torch(state.opt_g, gmap, lr),
        "optimizer_d": adam_state_to_torch(state.opt_d, dmap, lr),
    }
    if path is not None:
        import torch

        def tensorize(v):
            if isinstance(v, dict):
                return {k: tensorize(x) for k, x in v.items()}
            if isinstance(v, np.ndarray):
                return torch.from_numpy(np.ascontiguousarray(v))
            return v

        torch.save({k: tensorize(v) for k, v in out.items()}, path)
    return out
