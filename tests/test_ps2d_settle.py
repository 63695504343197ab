"""The automated ps2d default-settle loop (VERDICT r4 item 1).

``benchmarks/r5_settle_ps2d.py`` parses the on-chip A/B logs and writes
``benchmarks/ps2d_decision.json``; ``bench.ps2d_measured_default``
consumes it. These tests drive both halves offline with synthetic step
outputs so the on-chip run exercises only already-tested plumbing.
"""

import importlib.util
import json
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_settle():
    spec = importlib.util.spec_from_file_location(
        "r5_settle_ps2d",
        os.path.join(ROOT, "benchmarks", "r5_settle_ps2d.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_step(logs, name, vol_s=None, extra_lines=()):
    lines = ["some stderr-ish text that is not json"]
    if vol_s is not None:
        lines.append(json.dumps({
            # the REAL bench emits the long descriptive metric string —
            # the settle parser must prefix-match (r5 on-chip incident:
            # an exact match returned no base measurement)
            "metric": "volumes/sec/chip (240x240x155 skull-stripped "
                      "MRI, foreground-crop + Gaussian sliding-window "
                      "inference, UNet3D bf16)", "value": vol_s,
            "unit": "volumes/sec", "vs_baseline": vol_s / 20.0}))
    lines.extend(extra_lines)
    with open(os.path.join(logs, name + ".out"), "w") as f:
        f.write("\n".join(lines) + "\n")


def _exactness_line(ok=True, drift=0.004, levels=None):
    """levels=None emits the legacy untagged line (covers levels=1
    only); the current bench emits one tagged line per level."""
    tag = "" if levels is None else " levels=%d" % levels
    return json.dumps({
        "metric": "ps2d exactness%s (max |logit drift| vs base, same "
                  "params, shape (160, 160, 160))" % tag,
        "value": drift, "unit": "logit",
        "argmax_disagree_frac": 0.0, "ok": ok})


@pytest.fixture
def settle_env(tmp_path):
    mod = _load_settle()
    logs = tmp_path / "r5_logs"
    logs.mkdir()
    mod.LOGS = str(logs)
    mod.DECISION = str(tmp_path / "ps2d_decision.json")
    mod.RESULTS_MD = str(tmp_path / "RESULTS.md")
    return mod, str(logs)


def test_settle_win_flips_default_on(settle_env):
    mod, logs = settle_env
    _write_step(logs, "base_check", 10.5,
                extra_lines=[_exactness_line(ok=True, levels=1),
                             _exactness_line(ok=True, levels=2)])
    _write_step(logs, "base2", 10.78)
    _write_step(logs, "ps2d2", 12.4)
    _write_step(logs, "ps2d_l2", 13.1)
    _write_step(logs, "ps2d_l2_pool", None)   # step crashed: no JSON
    assert mod.main() == 0
    with open(mod.DECISION) as f:
        d = json.load(f)
    assert d["default_ps2d"] is True
    assert d["ps2d_levels"] == 2
    assert d["env"] == {}
    assert d["evidence"]["best_ps2d_step"] == "ps2d_l2"
    assert d["evidence"]["base_vol_s"] == 10.78
    with open(mod.RESULTS_MD) as f:
        assert "DEFAULT ON" in f.read()


def test_settle_drifting_l2_falls_back_to_passing_l1(settle_env):
    # levels=2 is fastest but fails its own margin-envelope gate:
    # settle must default to the fastest PASSING config, not fail
    # the whole win
    mod, logs = settle_env
    _write_step(logs, "base_check", 10.5,
                extra_lines=[_exactness_line(ok=True, levels=1),
                             _exactness_line(ok=False, levels=2)])
    _write_step(logs, "base2", 10.78)
    _write_step(logs, "ps2d2", 12.4)
    _write_step(logs, "ps2d_l2", 13.1)
    assert mod.main() == 0
    with open(mod.DECISION) as f:
        d = json.load(f)
    assert d["default_ps2d"] is True
    assert d["ps2d_levels"] == 1
    assert d["evidence"]["best_ps2d_step"] == "ps2d2"


def test_settle_legacy_untagged_line_covers_levels1(settle_env):
    # pre-r5-fixup logs carry a single untagged exactness line — it
    # must still gate levels=1 candidates
    mod, logs = settle_env
    _write_step(logs, "base_check", 10.5,
                extra_lines=[_exactness_line(ok=True)])
    _write_step(logs, "ps2d2", 12.4)
    assert mod.main() == 0
    with open(mod.DECISION) as f:
        d = json.load(f)
    assert d["default_ps2d"] is True and d["ps2d_levels"] == 1


def test_settle_env_opt_ins_survive_into_decision(settle_env):
    mod, logs = settle_env
    _write_step(logs, "base2", 10.0,
                extra_lines=[])
    _write_step(logs, "base_check", 9.9,
                extra_lines=[_exactness_line(ok=True, levels=1),
                             _exactness_line(ok=True, levels=2)])
    _write_step(logs, "ps2d_l2_full", 14.0)
    assert mod.main() == 0
    with open(mod.DECISION) as f:
        d = json.load(f)
    assert d["default_ps2d"] is True
    assert d["env"] == {"SEG3D_POOL_FUSED": "1", "SEG3D_PS2D_RELAXED": "1"}


def test_settle_loss_closes_measured(settle_env):
    mod, logs = settle_env
    _write_step(logs, "base_check", 10.78,
                extra_lines=[_exactness_line(ok=True)])
    _write_step(logs, "ps2d2", 9.2)
    assert mod.main() == 0
    with open(mod.DECISION) as f:
        d = json.load(f)
    assert d["default_ps2d"] is False
    assert d["ps2d_levels"] == 1 and d["env"] == {}
    with open(mod.RESULTS_MD) as f:
        assert "measured-and-closed" in f.read()


def test_settle_exactness_gate_vetoes_win(settle_env):
    mod, logs = settle_env
    _write_step(logs, "base_check", 10.0,
                extra_lines=[_exactness_line(ok=False, drift=0.9)])
    _write_step(logs, "ps2d2", 15.0)
    assert mod.main() == 0
    with open(mod.DECISION) as f:
        assert json.load(f)["default_ps2d"] is False


def test_settle_missing_measurements_is_a_noop(settle_env):
    mod, logs = settle_env
    _write_step(logs, "base2", 10.0)
    assert mod.main() == 1          # no ps2d arm: nothing to settle
    assert not os.path.exists(mod.DECISION)


def test_tpu_error_lines_are_not_measurements(settle_env):
    mod, logs = settle_env
    err = json.dumps({"metric": "volumes/sec/chip", "value": 0.0,
                      "error": "tpu_unavailable"})
    _write_step(logs, "base2", 10.0,
                extra_lines=[_exactness_line(ok=True)])
    with open(os.path.join(logs, "base_check.out"), "w") as f:
        f.write(err + "\n" + _exactness_line(ok=True) + "\n")
    _write_step(logs, "ps2d2", None, extra_lines=[err])
    assert mod.main() == 1          # the errored ps2d arm doesn't count


def test_bench_consumes_decision_file(tmp_path):
    import bench
    p = tmp_path / "ps2d_decision.json"
    # absent file -> conservative OFF
    assert bench.ps2d_measured_default(str(p)) == (False, 1, {})
    p.write_text(json.dumps({
        "default_ps2d": True, "ps2d_levels": 2,
        "env": {"SEG3D_POOL_FUSED": "1"}}))
    assert bench.ps2d_measured_default(str(p)) == (
        True, 2, {"SEG3D_POOL_FUSED": "1"})
    # corrupt file -> conservative OFF
    p.write_text("{not json")
    assert bench.ps2d_measured_default(str(p)) == (False, 1, {})
