"""Pure-logic tests for bench.py's driver-budget machinery (the TPU legs
themselves only run on hardware; what must never regress silently is the
scheduling logic that decides what a driver capture contains)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench


def test_stage2_decision_auto():
    # plenty of slice left after stage 1 -> run stage 2, decode there
    assert bench._stage2_decision("auto", 150.0, 400.0) == (True, False)
    # slice nearly spent -> stage-1-only, decode if >2 min remain
    assert bench._stage2_decision("auto", 200.0, 200.0) == (False, True)
    assert bench._stage2_decision("auto", 200.0, 100.0) == (False, False)
    # boundary: needs strictly more than 1.15x + 60
    assert bench._stage2_decision("auto", 100.0, 175.0) == (False, True)
    assert bench._stage2_decision("auto", 100.0, 176.0) == (True, False)


def test_stage2_decision_forced():
    assert bench._stage2_decision("both", 1e9, 0.0) == (True, False)
    assert bench._stage2_decision("stage1", 0.0, 400.0) == (False, True)
    assert bench._stage2_decision("stage1", 0.0, 60.0) == (False, False)


def test_relay_probe_subprocess():
    """_relay_alive must return (not hang) and report True on the CPU
    backend the test tier runs under; a dead relay is simulated by an
    unsatisfiable timeout."""
    assert bench._relay_alive(timeout=120, platform="cpu") is True
    assert bench._relay_alive(timeout=0.001) is False


def test_default_run_registry_consistent():
    """Every default-run key resolves to a registered leg mode, floors
    are positive, and optional caps are at least the floor (a cap below
    the floor would start-and-instantly-kill a leg)."""
    for key, env_gate, floor_s, *cap in bench._DEFAULT_RUN:
        mode = bench._KEY_TO_MODE.get(key, key)
        assert mode in bench._LEGS, f"{key} -> {mode} not a leg"
        assert env_gate.startswith("MORE4D_BENCH_")
        assert floor_s > 0
        if cap:
            assert cap[0] >= floor_s, (key, cap, floor_s)
    # default-off keys must still be default-run entries
    keys = {k for k, *_ in bench._DEFAULT_RUN}
    assert bench._DEFAULT_OFF <= keys


def test_bench_zero_budget_emits_parseable_capture():
    """`python bench.py` with an exhausted budget must still exit 0 and
    print parseable JSON lines whose last line records every skipped leg —
    the exact guarantee the driver capture relies on (BENCH_r02 died at
    rc=124 with an EMPTY tail; this pins the fixed contract)."""
    import json
    import subprocess

    env = dict(os.environ, MORE4D_BENCH_PROBE="0",
               MORE4D_BENCH_BUDGET_S="1")
    proc = subprocess.run(
        [sys.executable, "bench.py"], env=env,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        capture_output=True, text=True, timeout=180)
    assert proc.returncode == 0, proc.stderr[-500:]
    lines = [json.loads(l) for l in proc.stdout.strip().splitlines()]
    assert lines, "no output lines"
    for line in lines:
        assert {"metric", "value", "unit", "vs_baseline"} <= set(line)
    skipped = {s["leg"] for s in lines[-1]["extra"]["legs_skipped"]}
    assert "denoise" in skipped and "two_stage_1.3b" in skipped


def test_reserve_scheduling_all_legs_start_in_good_phase():
    """The reserve-based slice rule (bench.main): each leg's slice is
    trimmed so the floors of every later enabled leg still fit.  At the
    measured good-phase leg costs and the 900 s default budget, every
    default-on leg must START (legs_skipped == []) — VERDICT r3 weak #2."""
    run_list = [(k, f, c[0] if c else None)
                for k, g, f, *c in bench._DEFAULT_RUN
                if k not in bench._DEFAULT_OFF]
    # good-phase wall costs incl. ~40 s process boot (round-3/5 captures;
    # canary: 13 s of warm-cache checks + boot; lora: park + first-step
    # compile + 2-3 steps, measured round 5)
    costs = {"canary": 60, "denoise": 190, "two_stage_1.3b": 280,
             "train_14b_lora": 250, "train_1.3b": 110, "two_stage_14b": 200}
    t, started = 0.0, []
    for idx, (key, floor_s, cap) in enumerate(run_list):
        remaining = 900 - t
        if remaining < floor_s:
            continue
        later = sum(f for _, f, _ in run_list[idx + 1:])
        slice_s = max(floor_s, remaining - later)
        if cap:
            slice_s = min(slice_s, cap)
        slice_s = min(slice_s, remaining)
        started.append(key)
        t += min(costs[key], slice_s)
    assert started == [k for k, _, _ in run_list], started
    assert t <= 900


def test_salvage_partial_from_killed_leg():
    """A leg killed mid-run must yield its last _emit_partial line (tagged
    with the timeout), not a bare error — the contract that finally lands
    stage-1 two_stage numbers in a driver capture (VERDICT r4 #2)."""
    import json

    part = json.dumps({"metric": "two_stage_e2e_seconds", "partial": True,
                       "extra": {"stage1_s": 25.8,
                                 "partial_through": "stage1"}})
    captured = "some log noise\n" + part + "\ntruncated {garb"
    res = bench._salvage_partial(captured, 200, "two_stage")
    assert res["extra"]["stage1_s"] == 25.8
    assert res["extra"]["leg_timed_out_after_s"] == 200
    assert res["partial"] is True
    # bytes input and no-JSON input both degrade gracefully
    assert bench._salvage_partial(part.encode(), 99, "x")["partial"]
    empty = bench._salvage_partial("no json here", 99, "two_stage")
    assert "timed out" in empty["error"]


def test_emit_partial_shape(capsys):
    """_emit_partial prints ONE parseable JSON line and does not mutate
    the caller's dict."""
    import json

    timings = {"stage1_s": 30.0}
    bench._emit_partial("two_stage_e2e_seconds", timings, "stage1")
    line = capsys.readouterr().out.strip()
    out = json.loads(line)
    assert out["partial"] is True
    assert out["extra"]["partial_through"] == "stage1"
    assert "partial_through" not in timings
