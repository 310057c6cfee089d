"""jckx.plan — the AOT capacity planner. The real-topology path needs the
TPU compiler (exercised by tools/profiling + artifacts/r5); the suite
pins the CLI contract on the virtual-CPU path with a toy geometry."""

import json

import numpy as np


def _plan(argv):
    from jckx.plan import plan

    return plan(argv)


def _toy(extra=()):
    return ["--topology", "", "--devices", "8",
            "--image_size", "16", "-b", "16", "--base_width", "16",
            "--tp_min_dim", "16", "--dataset", "synthetic",
            *extra]


def test_plan_dp_report_contract():
    """Default mesh (8-way data parallel): one JSON report with cost,
    memory, collective inventory, floors, and a bound verdict."""
    r = _plan(_toy(["-m", "DCGAN"]))
    assert r["model"] == "DCGAN"
    assert r["mesh"]["shape"] == {"data": 8}
    assert r["per_chip"]["step_flops"] > 0
    assert r["per_chip"]["step_hbm_bytes"] > 0
    # data parallelism must sync gradients across the mesh
    assert "all-reduce" in r["cross_shard_ops"]
    assert r["bound"] in r["step_floors_us"]
    assert r["max_images_per_s_global"] > 0
    # the caveat the CPU fallback must carry (r5: f32-conv legalization)
    assert "CAVEAT" in r["backend"]
    json.dumps(r)  # the whole report is JSON-serializable


def test_plan_tp_shards_state_and_cgan_parses():
    """--mesh_shape 4,2 TP: cross-shard traffic appears on the model axis
    too; the conditional family builds the labeled step."""
    r = _plan(_toy(["-m", "CGAN", "--mesh_shape", "4,2",
                    "--mesh_axes", "data,model",
                    "--model_axis_mode", "tp"]))
    assert r["model"] == "CGAN"
    assert r["mesh"]["shape"] == {"data": 4, "model": 2}
    assert r["per_chip"]["cross_shard_bytes"] > 0


def test_plan_mesh_size_mismatch_fails_loudly():
    import pytest

    with pytest.raises(SystemExit, match="devices"):
        _plan(_toy(["--mesh_shape", "4,4"]))


def test_plan_memory_fits_toy():
    r = _plan(_toy())
    mem = r["per_chip"]["memory"]
    if "error" not in mem:
        assert mem["fits"] and mem["peak_mb"] < mem["hbm_mb"]
        assert mem["peak_mb"] > 0


def test_plan_floors_scale_with_overrides():
    """Halving the claimed HBM bandwidth doubles the HBM floor — the
    roofline math is wired to the flags, not hardcoded."""
    a = _plan(_toy())
    b = _plan(_toy(["--hbm_gbps", str(819.0 / 2)]))
    np.testing.assert_allclose(
        b["step_floors_us"]["hbm_bandwidth"],
        2 * a["step_floors_us"]["hbm_bandwidth"],
        atol=0.25)  # the report rounds floors to 0.1 µs
