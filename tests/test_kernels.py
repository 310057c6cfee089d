"""Fused BN+activation kernel: XLA/Pallas agreement, scoping, partitioning.

The Pallas path engages on TPU — or on any backend in interpret mode
(JCKX_PALLAS_INTERPRET=1), which is how the CPU test mesh exercises the
kernel body, its dispatch, and its custom_partitioning rule. On-device
Pallas-vs-XLA agreement is additionally asserted by the perf harness /
verify drives."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from jckx.kernels import fused_bn_act as fba


def test_bn_act_matches_torch_bn_relu():
    rng = np.random.RandomState(0)
    x = rng.randn(8, 6, 6, 5).astype(np.float32)
    scale = rng.rand(5).astype(np.float32) + 0.5
    bias = rng.randn(5).astype(np.float32)
    y = np.asarray(fba.bn_act(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), act="relu"))
    bn = torch.nn.BatchNorm2d(5)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(scale))
        bn.bias.copy_(torch.from_numpy(bias))
    bn.train()
    ref = torch.relu(bn(torch.from_numpy(x.transpose(0, 3, 1, 2))))
    ref = ref.detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4)


def test_bn_act_leaky_negative_slope():
    x = jnp.asarray(np.linspace(-4, 4, 64, dtype=np.float32).reshape(1, 8, 8, 1))
    y = fba.bn_act(x, jnp.ones((1,)), jnp.zeros((1,)), act="leaky_relu", negative_slope=0.2)
    yn = np.asarray(y)
    # normalized then leaky: negative outputs scaled by exactly 0.2
    pre = (np.asarray(x) - np.asarray(x).mean()) / np.asarray(x).std()
    exp = np.where(pre >= 0, pre, 0.2 * pre)
    np.testing.assert_allclose(yn, exp, rtol=1e-3, atol=1e-3)


def test_pallas_inference_scope_restores_flag():
    assert fba._USE_PALLAS is False
    with fba.pallas_inference():
        assert fba._USE_PALLAS is True
        with fba.pallas_inference():
            assert fba._USE_PALLAS is True
        assert fba._USE_PALLAS is True
    assert fba._USE_PALLAS is False


def test_pallas_kernel_interpret_mode_matches_xla():
    """With JCKX_PALLAS_INTERPRET=1 the Pallas kernel runs interpreted on
    CPU — full numeric check of the kernel body against the XLA path."""
    import os

    os.environ["JCKX_PALLAS_INTERPRET"] = "1"
    try:
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(16, 4, 4, 128).astype(np.float32))
        s = jnp.asarray(rng.rand(128).astype(np.float32) + 0.5)
        b = jnp.asarray(rng.randn(128).astype(np.float32))
        ref = np.asarray(fba.bn_act(x, s, b, act="leaky_relu"))
        with fba.pallas_inference():
            # dispatch requires the pallas-eligible conditions except backend;
            # call the pallas path directly (interpret mode works on CPU)
            got = np.asarray(fba._bn_act_pallas(x, s, b, "leaky_relu", 0.2, 1e-5))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    finally:
        os.environ.pop("JCKX_PALLAS_INTERPRET", None)


def test_pallas_partitioned_sharded_matches_and_no_allgather(monkeypatch):
    """The Pallas stage is custom_partitioning-wrapped: on a batch-sharded
    8-device mesh the jitted bn_act (a) takes the Pallas dispatch, (b)
    matches the unsharded XLA path, and (c) compiles with NO all-gather —
    the kernel shards on rows instead of being replicated around an opaque
    custom call (this is what keeps multi-chip serving's elementwise stage
    partitioned, jckx/serve.py)."""
    import os

    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from jckx.parallel import make_mesh

    os.environ["JCKX_PALLAS_INTERPRET"] = "1"
    calls = []
    orig = fba._bn_act_pallas
    monkeypatch.setattr(
        fba, "_bn_act_pallas",
        lambda *a, **k: (calls.append(1), orig(*a, **k))[1])
    try:
        rng = np.random.RandomState(7)
        x = jnp.asarray(rng.randn(16, 4, 4, 128).astype(np.float32))
        s = jnp.asarray(rng.rand(128).astype(np.float32) + 0.5)
        b = jnp.asarray(rng.randn(128).astype(np.float32))
        ref = np.asarray(fba._bn_act_xla(x, s, b, "leaky_relu", 0.2, 1e-5))

        mesh = make_mesh((8,), ("data",))
        xsh = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        xd = jax.device_put(x, xsh)
        with fba.pallas_inference():
            f = jax.jit(
                lambda x, s, b: fba.bn_act(x, s, b, act="leaky_relu"),
                in_shardings=(xsh, repl, repl), out_shardings=xsh)
            got = np.asarray(f(xd, s, b))
            hlo = f.lower(xd, s, b).compile().as_text()
        assert calls, "Pallas dispatch did not engage"
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
        assert "all-gather" not in hlo
    finally:
        os.environ.pop("JCKX_PALLAS_INTERPRET", None)


def test_pallas_partitioned_auto_propagation(monkeypatch):
    """Without explicit in_shardings, the partitioner must still shard the
    kernel from the INPUT's sharding alone — that's what the Shardy
    sharding_rule provides. jit with no sharding annotations, batch-sharded
    operand in: output must come back batch-sharded with no all-gather."""
    import os

    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from jckx.parallel import make_mesh

    os.environ["JCKX_PALLAS_INTERPRET"] = "1"
    try:
        rng = np.random.RandomState(11)
        x = jnp.asarray(rng.randn(16, 4, 4, 128).astype(np.float32))
        s = jnp.asarray(rng.rand(128).astype(np.float32) + 0.5)
        b = jnp.asarray(rng.randn(128).astype(np.float32))
        ref = np.asarray(fba._bn_act_xla(x, s, b, "leaky_relu", 0.2, 1e-5))

        mesh = make_mesh((8,), ("data",))
        xd = jax.device_put(x, NamedSharding(mesh, P("data")))
        with fba.pallas_inference():
            f = jax.jit(lambda x, s, b: fba.bn_act(x, s, b, act="leaky_relu"))
            got = f(xd, s, b)
            hlo = f.lower(xd, s, b).compile().as_text()
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)
        assert "all-gather" not in hlo
    finally:
        os.environ.pop("JCKX_PALLAS_INTERPRET", None)


def test_bn_act_grad_and_double_grad():
    # the GP path needs grad-of-grad through bn_act (XLA path)
    x0 = jnp.asarray(np.random.RandomState(1).randn(4, 4, 4, 3).astype(np.float32))
    s, b = jnp.ones((3,)), jnp.zeros((3,))

    def f(x):
        return jnp.sum(fba.bn_act(x, s, b, act="leaky_relu") ** 2)

    def g(x):
        return jnp.sum(jax.grad(f)(x) ** 2)

    gg = jax.grad(g)(x0)
    assert np.isfinite(np.asarray(gg)).all()
