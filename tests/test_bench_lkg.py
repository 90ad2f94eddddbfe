"""bench._last_known_good: the relay-outage fallback block in the BENCH JSON.

When the TPU relay is down at bench time, supervise() emits an error JSON
and attaches the newest prior round's real numbers. Two on-disk formats
exist: a plain bench JSON, and the driver's wrapper ({"tail": "<stdout>"})
whose last parseable line is the bench JSON. Both are pinned here.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def _write(tmp_path, name, obj):
    (tmp_path / name).write_text(json.dumps(obj))


def _bench_json(value, ms):
    return {
        "metric": "train images/sec (unet_resnet50 bce 512x512 b8 bf16)",
        "value": value,
        "unit": "images/sec",
        "ms_per_step": ms,
        "model_tflops_per_sec": 75.7,
        "pct_of_matmul_peak": 40.7,
    }


def test_picks_newest_round_with_a_real_value(tmp_path):
    _write(tmp_path, "BENCH_r01.json", _bench_json(125.0, 64.0))
    _write(tmp_path, "BENCH_r02.json", _bench_json(131.6, 60.8))
    lkg = bench._last_known_good(str(tmp_path))
    assert lkg["source"] == "BENCH_r02.json"
    assert lkg["value"] == 131.6
    assert lkg["ms_per_step"] == 60.8


def test_skips_error_rounds_without_a_value(tmp_path):
    _write(tmp_path, "BENCH_r01.json", _bench_json(125.0, 64.0))
    _write(tmp_path, "BENCH_r03.json",
           {"metric": "train images/sec", "value": None,
            "error": "tpu relay unreachable"})
    lkg = bench._last_known_good(str(tmp_path))
    assert lkg["source"] == "BENCH_r01.json"
    assert lkg["value"] == 125.0


def test_unwraps_driver_tail_format(tmp_path):
    # The driver records bench stdout as {"tail": ...}; progress lines and
    # the JSON line are interleaved — the last parseable line wins.
    tail = "\n".join([
        "[bench] section train:8:bce (attempt 1/3)",
        "not json {",
        json.dumps(_bench_json(131.6, 60.8)),
    ])
    _write(tmp_path, "BENCH_r02.json", {"tail": tail})
    lkg = bench._last_known_good(str(tmp_path))
    assert lkg["source"] == "BENCH_r02.json"
    assert lkg["value"] == 131.6
    assert lkg["pct_of_matmul_peak"] == 40.7


def test_ignores_garbage_and_returns_none_when_nothing_usable(tmp_path):
    (tmp_path / "BENCH_r01.json").write_text("not json at all")
    _write(tmp_path, "BENCH_r02.json", {"tail": "no parseable line here"})
    _write(tmp_path, "BENCH_rX.json", _bench_json(999.0, 1.0))  # bad name
    assert bench._last_known_good(str(tmp_path)) is None
    # Empty dir, too.
    empty = tmp_path / "empty"
    os.makedirs(empty)
    assert bench._last_known_good(str(empty)) is None


def test_relay_up_skips_probe_when_budget_exhausted(monkeypatch):
    # Round-5 rehearsal post-mortem: a section timeout at the full deadline
    # followed by a 240 s verdict probe overshot the driver's axe (rc=124,
    # no output). With no budget left the probe must be SKIPPED, not run.
    def boom(*a, **k):
        raise AssertionError("probe subprocess must not be spawned")

    monkeypatch.setattr(bench.subprocess, "run", boom)
    assert bench._relay_up(attempts=2, budget=10.0) is False


def test_relay_up_clamps_probe_timeout_to_budget(monkeypatch):
    seen = []

    def fake_run(cmd, **kw):
        seen.append(kw["timeout"])
        raise bench.subprocess.TimeoutExpired(cmd, kw["timeout"])

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setenv("BENCH_PROBE_TIMEOUT", "240")
    assert bench._relay_up(attempts=1, budget=90.0) is False
    assert len(seen) == 1 and seen[0] <= 85.0  # 90 − 5 s margin, < 240
    # No budget → the full BENCH_PROBE_TIMEOUT applies.
    seen.clear()
    assert bench._relay_up(attempts=1, budget=None) is False
    assert seen == [240.0]


def test_supervise_relay_down_midrun_still_emits(monkeypatch, capsys,
                                                 tmp_path):
    # A RelayDown raised from any section (the timeout-verdict path) must
    # still produce the final JSON line, honestly flagged, with
    # last-known-good numbers attached when a prior round has them.
    _write(tmp_path, "BENCH_r02.json", _bench_json(131.6, 60.8))

    def dead_run_sub(spec, budget=None):
        raise bench.RelayDown(spec)

    monkeypatch.setattr(bench, "_relay_up", lambda *a, **k: True)
    monkeypatch.setattr(bench, "_run_sub", dead_run_sub)
    real_lkg = bench._last_known_good
    monkeypatch.setattr(
        bench, "_last_known_good", lambda *a: real_lkg(str(tmp_path))
    )
    monkeypatch.setenv("BENCH_LAST_FULL_DIR", str(tmp_path))
    bench.supervise()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["value"] is None
    assert "unreachable" in out["error"]
    assert out["last_known_good"]["value"] == 131.6


def _fake_run_sub(calls):
    def run(spec, budget=None):
        calls.append(spec)
        if spec.startswith("train:") and ":w" in spec:
            return {"images_per_sec": 82.7, "ms_per_step": 96.75,
                    "model_tflops_per_sec": 127.4}
        if spec.startswith("train:"):
            return {"images_per_sec": 130.4, "ms_per_step": 61.35,
                    "model_tflops_per_sec": 75.1}
        if spec.startswith("predict:"):
            return {"device_ms_per_image": 2.8, "images_per_sec": 353.4}
        if spec == "ceiling":
            return {"matmul_ceiling_tflops": 186.0}
        raise AssertionError(spec)
    return run


def test_supervise_emits_w2_row_with_pct_of_peak(monkeypatch, capsys, tmp_path):
    # VERDICT r3 #7: the decoder-width lever must appear in the driver's
    # default BENCH artifact next to the w1 parity row, with %-of-peak.
    calls = []
    monkeypatch.setattr(bench, "_relay_up", lambda *a, **k: True)
    monkeypatch.setattr(bench, "_run_sub", _fake_run_sub(calls))
    monkeypatch.setenv("BENCH_LAST_FULL_DIR", str(tmp_path))
    bench.supervise()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "train:8:bce:w2.0" in calls
    w2 = out["train_decoder_width2"]
    assert w2["images_per_sec"] == 82.7
    assert w2["pct_of_matmul_peak"] == round(100 * 127.4 / 186.0, 1)
    assert out["pct_of_matmul_peak"] == round(100 * 75.1 / 186.0, 1)


def test_supervise_w2_optout(monkeypatch, capsys, tmp_path):
    calls = []
    monkeypatch.setattr(bench, "_relay_up", lambda *a, **k: True)
    monkeypatch.setattr(bench, "_run_sub", _fake_run_sub(calls))
    monkeypatch.setenv("BENCH_W2", "0")
    monkeypatch.setenv("BENCH_LAST_FULL_DIR", str(tmp_path))
    bench.supervise()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert not any(":w" in c for c in calls if c.startswith("train:"))
    assert "train_decoder_width2" not in out


def test_supervise_emits_provisional_then_final_line(monkeypatch, capsys,
                                                     tmp_path):
    # Round-5 deadline design: a provisional JSON line lands right after
    # headline+ceiling, so a driver kill mid-optional-section still leaves
    # a parseable artifact. The final line must NOT carry the marker.
    monkeypatch.setattr(bench, "_relay_up", lambda *a, **k: True)
    monkeypatch.setattr(bench, "_run_sub", _fake_run_sub([]))
    monkeypatch.setenv("BENCH_LAST_FULL_DIR", str(tmp_path))
    bench.supervise()
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l]
    assert len(lines) == 2
    prov, final = json.loads(lines[0]), json.loads(lines[1])
    assert "provisional" in prov and prov["value"] == 130.4
    assert prov["pct_of_matmul_peak"] == round(100 * 75.1 / 186.0, 1)
    assert "provisional" not in final and final["value"] == 130.4


def test_supervise_complete_run_refreshes_last_full_snapshot(
        monkeypatch, capsys, tmp_path):
    monkeypatch.setattr(bench, "_relay_up", lambda *a, **k: True)
    monkeypatch.setattr(bench, "_run_sub", _fake_run_sub([]))
    monkeypatch.setenv("BENCH_LAST_FULL_DIR", str(tmp_path))
    bench.supervise()
    capsys.readouterr()
    snap = json.loads((tmp_path / "BENCH_LAST_FULL.json").read_text())
    assert snap["result"]["value"] == 130.4
    assert snap["result"]["train_decoder_width2"]["images_per_sec"] == 82.7
    assert snap["date"]


def test_supervise_deadline_sheds_and_backfills_from_last_full(
        monkeypatch, capsys, tmp_path):
    # With an (absurdly) tiny BENCH_DEADLINE every section is shed; the
    # emitted JSON must say so explicitly and back-fill the optional rows
    # from the last complete sweep's snapshot, clearly labeled.
    snap_result = _bench_json(131.6, 60.8)
    snap_result["train_decoder_width2"] = {"images_per_sec": 82.7}
    snap_result["matmul_ceiling_tflops"] = 186.0
    (tmp_path / "BENCH_LAST_FULL.json").write_text(
        json.dumps({"date": "2026-08-19", "result": snap_result}))
    monkeypatch.setattr(bench, "_relay_up", lambda *a, **k: True)
    monkeypatch.setattr(bench, "_run_sub", _fake_run_sub([]))
    monkeypatch.setenv("BENCH_LAST_FULL_DIR", str(tmp_path))
    monkeypatch.setenv("BENCH_DEADLINE", "0.001")
    bench.supervise()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["value"] is None
    assert "train:8:bce" in out["sections_skipped_deadline"]
    fill = out["from_last_full"]
    assert fill["date"] == "2026-08-19"
    assert fill["train_decoder_width2"]["images_per_sec"] == 82.7
    assert fill["matmul_ceiling_tflops"] == 186.0


def test_supervise_deadline_fits_everything_no_shed_markers(
        monkeypatch, capsys, tmp_path):
    monkeypatch.setattr(bench, "_relay_up", lambda *a, **k: True)
    monkeypatch.setattr(bench, "_run_sub", _fake_run_sub([]))
    monkeypatch.setenv("BENCH_LAST_FULL_DIR", str(tmp_path))
    monkeypatch.setenv("BENCH_DEADLINE", "1080")
    bench.supervise()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "sections_skipped_deadline" not in out
    assert "from_last_full" not in out
    assert out["train_decoder_width2"]["images_per_sec"] == 82.7
