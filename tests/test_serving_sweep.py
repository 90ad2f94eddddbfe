"""serving_sweep.py: sweep orchestration semantics (no TPU needed).

The sweep is the producer of the SERVING.json headline artifact, so its
resume/skip/abort behavior is pinned here with bench._run_sub stubbed out:
completed points must survive a RelayDown abort and be skipped on re-run
(the relay outage recovery story depends on exactly this).
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
import serving_sweep  # noqa: E402
import bench  # noqa: E402


def _point(size, batch):
    return {"images_per_sec": 100.0 + batch, "device_ms_per_image": 10.0 - batch / 10,
            "size": size, "batch": batch}


def _run(argv, monkeypatch, capsys):
    monkeypatch.setattr(sys, "argv", ["serving_sweep.py"] + argv)
    serving_sweep.main()
    return capsys.readouterr().out


def test_sweep_writes_incrementally_and_renders_table(tmp_path, monkeypatch, capsys):
    out = tmp_path / "SERVING.json"
    calls = []

    def fake_run_sub(spec):
        calls.append(spec)
        _, size, batch = spec.split(":")
        return _point(int(size), int(batch))

    monkeypatch.setattr(bench, "_run_sub", fake_run_sub)
    stdout = _run(["--sizes", "480", "512", "--batches", "1", "8",
                   "--out", str(out)], monkeypatch, capsys)

    assert calls == ["predict:480:1", "predict:480:8",
                     "predict:512:1", "predict:512:8"]
    results = json.loads(out.read_text())
    assert results["480"]["1"]["images_per_sec"] == 101.0
    assert results["512"]["8"]["device_ms_per_image"] == pytest.approx(9.2)
    # Markdown table: one row per batch, one img/s + ms/img pair per size.
    lines = [l for l in stdout.splitlines() if l.startswith("|")]
    assert "480² img/s" in lines[0] and "512² ms/img" in lines[0]
    assert lines[2].startswith("| 1 |") and lines[3].startswith("| 8 |")


def test_sweep_skips_completed_points_on_rerun(tmp_path, monkeypatch, capsys):
    out = tmp_path / "SERVING.json"
    out.write_text(json.dumps({"512": {"1": _point(512, 1)}}))
    calls = []

    def fake_run_sub(spec):
        calls.append(spec)
        _, size, batch = spec.split(":")
        return _point(int(size), int(batch))

    monkeypatch.setattr(bench, "_run_sub", fake_run_sub)
    _run(["--sizes", "512", "--batches", "1", "8", "--out", str(out)],
         monkeypatch, capsys)

    assert calls == ["predict:512:8"]  # the pre-existing b1 point is kept
    results = json.loads(out.read_text())
    assert set(results["512"]) == {"1", "8"}


def test_sweep_aborts_on_relay_down_keeping_completed_points(
        tmp_path, monkeypatch, capsys):
    out = tmp_path / "SERVING.json"

    def fake_run_sub(spec):
        if spec.endswith(":8"):
            raise bench.RelayDown(spec)
        _, size, batch = spec.split(":")
        return _point(int(size), int(batch))

    monkeypatch.setattr(bench, "_run_sub", fake_run_sub)
    stdout = _run(["--sizes", "512", "--batches", "1", "8", "16",
                   "--out", str(out)], monkeypatch, capsys)

    # b1 completed and is on disk; b8 raised; b16 was never attempted.
    results = json.loads(out.read_text())
    assert set(results["512"]) == {"1"}
    # The partial table still renders (resume covers the rest later).
    assert any(l.startswith("| 1 |") for l in stdout.splitlines())


def test_sweep_skips_failed_points_without_recording(tmp_path, monkeypatch, capsys):
    """_run_sub returns None when a section exhausts retries: the point must
    not be recorded (a re-run retries it) and the sweep must continue."""
    out = tmp_path / "SERVING.json"

    def fake_run_sub(spec):
        if spec == "predict:512:1":
            return None
        _, size, batch = spec.split(":")
        return _point(int(size), int(batch))

    monkeypatch.setattr(bench, "_run_sub", fake_run_sub)
    _run(["--sizes", "512", "--batches", "1", "8", "--out", str(out)],
         monkeypatch, capsys)

    results = json.loads(out.read_text())
    assert set(results["512"]) == {"8"}


def test_run_point_exports_env_knobs(monkeypatch):
    """run_point forwards retry/timeout knobs through the env that
    bench._run_sub actually reads (the runbook's safety contract)."""
    seen = {}

    def fake_run_sub(spec):
        seen["spec"] = spec
        seen["retries"] = os.environ.get("BENCH_RETRIES")
        seen["timeout"] = os.environ.get("BENCH_SECTION_TIMEOUT")
        return _point(256, 4)

    monkeypatch.setattr(bench, "_run_sub", fake_run_sub)
    serving_sweep.run_point(256, 4, retries=1, timeout=3600.0)
    assert seen == {"spec": "predict:256:4", "retries": "1", "timeout": "3600.0"}
