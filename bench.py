"""Headline benchmark: train + predict throughput on the flagship config.

Covers BOTH halves of the BASELINE.json north star ("images/sec/chip
train+predict @512^2"):

  - train: the full jitted step (forward + loss + backward + optimizer
    update) for unet_resnet50, binary, 512x512, bf16 compute — the
    reference's default model (/root/reference/train.py:552) at its training
    resolution — at batch 8 (headline), batch 16, AND the CLI-default
    Lovasz-hinge loss at batch 8 in both compute dtypes (the CLI defaults
    that config to f32 for accuracy parity, PARITY.md; bf16 via --amp).
  - predict: inference forward (steps.make_predict_fn semantics, softmax on
    device — what predict.py times at /root/reference/predict.py:134-145)
    at the reference's hardcoded 480^2 and the training 512^2, single-image
    AND batched. ``device_ms_per_image`` is the pure per-image device time;
    ``e2e_ms_per_image`` additionally includes one dispatch + full softmax
    fetch per call, i.e. what a predict.py user sees — on this relayed host
    that number is dominated by the ~10 MB/s host link, not the chip.

Prints ONE JSON line. ``value`` is train b8 images/sec; the honest context
rides along as extra keys: ms/step, model TF/s (FLOPs from XLA cost
analysis), % of this chip's matmul ceiling measured live (8k bf16 matmul),
the b16/lovasz train rows, and the predict table. ``vs_baseline`` is vs the
measured torch reference on this host (BASELINE_MEASURED.json; CPU-only —
no CUDA GPU exists here — so it is a sanity floor; ``pct_of_matmul_peak``
is the quality bar).

Robustness (round 3): the remote compile service this environment relays to
intermittently hard-kills processes during large compiles, so the default
entry point is a pure-Python SUPERVISOR that runs each measurement as a
retried subprocess (``BENCH_SECTION=<spec> python bench.py``); a flaky
compile costs one section retry, not the whole benchmark. Timing is by
CHAINED DISPATCH of the bare jitted step (two call-counts, subtracted) —
the same executable real training runs, warm in the persistent compile
cache — instead of jitted ``fori_loop`` mega-graphs (10+ min cold compiles
through the relay). A cheap reachability probe (128^2 matmul subprocess,
BENCH_PROBE_TIMEOUT) gates the run and every section timeout: when the
relay itself is hung (observed outage 2026-08-17: ``jax.devices()`` blocked
for hours), the supervisor emits the JSON line with ``"error"`` set after
minutes instead of burning retries*timeout on all sections.

Deadline (round 5): the supervisor enforces a TOTAL wall clock
(BENCH_DEADLINE, default 1080 s) so the driver's own timeout can never
produce an empty artifact again (BENCH_r04 was rc=124 with zero output):
headline + ceiling run first, a provisional JSON line is emitted as soon as
they land, optional sections are shed loudly when the budget runs out, and
shed rows are back-filled (clearly labeled) from BENCH_LAST_FULL.json — the
snapshot refreshed by any complete sweep (``BENCH_FULL=1`` disables the
deadline and is what scripts/tpu_backlog.sh uses). Sections and relay
probes only see deadline − BENCH_DEADLINE_RESERVE (default 120 s), so the
final JSON emit always happens INSIDE the deadline — a hung relay can no
longer push a verdict probe past the driver's axe. Env knobs: BENCH_SIZE,
BENCH_STEPS, BENCH_BATCHES, BENCH_PREDICT=0 / BENCH_LOVASZ=0 / BENCH_W2=0
to skip sections, BENCH_RETRIES, BENCH_SECTION_TIMEOUT, BENCH_PROBE_TIMEOUT,
BENCH_DEADLINE, BENCH_DEADLINE_RESERVE, BENCH_FULL.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _progress(msg: str) -> None:
    """Markers on stderr (stdout stays machine-readable JSON)."""
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _timed_chain(step, fetch, k_long: int, k_short: int) -> float:
    """Per-step seconds by timing two chained-dispatch counts and subtracting.

    ``step()`` enqueues one executable run (each call's input is the previous
    call's output, so the device must execute every one); ``fetch(last)``
    forces completion by FETCHING a value — block_until_ready alone returns
    early on relayed backends (ROADMAP.md environment traps). The pipeline
    fill + final-fetch RTT is a fixed tail that cancels in the subtraction.
    """
    fetch(step())  # compile + warmup; drains the queue
    times = {}
    for k in (k_short, k_long):
        t0 = time.perf_counter()
        last = None
        for _ in range(k):
            last = step()
        fetch(last)
        times[k] = time.perf_counter() - t0
    return (times[k_long] - times[k_short]) / (k_long - k_short)


# --------------------------------------------------------------------------
# Section workers (each runs in its own subprocess under the supervisor)
# --------------------------------------------------------------------------


def _knobs():
    size = int(os.environ.get("BENCH_SIZE", "512"))
    n_steps = int(os.environ.get("BENCH_STEPS", "20"))
    return size, n_steps, max(n_steps // 4, 1)


def _train_section(batch: int, loss_name: str, f32: bool = False,
                   decoder_width: float = 1.0) -> dict:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from unet_embroidery_seg_tpu.engine import TrainState, steps
    from unet_embroidery_seg_tpu.models import build_model, init_model
    from unet_embroidery_seg_tpu.ops import schedules
    from unet_embroidery_seg_tpu.parallel import (
        make_mesh, replicate, shard_batch_arrays,
    )

    size, k_long, k_short = _knobs()
    mesh = make_mesh()
    dtype = None if f32 else jnp.bfloat16
    model = build_model(
        "unet_resnet50", num_classes=2, dtype=dtype, diff_head=True,
        decoder_width=decoder_width,
    )
    tx = schedules.make_train_optimizer(
        1e-4, param_dtype=jnp.float32 if f32 else None
    )
    pos_weight = 5.0 if loss_name == "bce" else None
    train_step = steps.make_binary_train_step(model, tx, loss_name, pos_weight)
    step_rng = jax.random.PRNGKey(1)

    variables = init_model(model, jax.random.PRNGKey(0), (size, size))
    state = jax.device_put(TrainState.create(variables, tx), replicate(mesh))
    rng = np.random.RandomState(0)
    images, pngs, sample_mask = shard_batch_arrays(
        mesh,
        rng.rand(batch, size, size, 3).astype(np.float32),
        (rng.rand(batch, size, size) > 0.7).astype(np.int32),
        np.ones(batch, np.float32),
    )

    box = [state]

    def step():
        st, loss = train_step(box[0], images, pngs, sample_mask, step_rng)
        box[0] = st
        return loss

    per_step = _timed_chain(step, float, k_long, k_short)

    # Model FLOPs from XLA's own cost analysis of ONE step. None (not NaN)
    # on failure so the output stays strict JSON.
    flops = None
    if loss_name == "bce":
        try:
            one = train_step.lower(
                box[0], images, pngs, sample_mask, step_rng
            ).compile()
            flops = float(one.cost_analysis()["flops"])
        except Exception:
            flops = None

    out = {
        "images_per_sec": round(batch / per_step, 2),
        "ms_per_step": round(per_step * 1e3, 2),
    }
    if loss_name == "bce":
        out["model_tflops_per_sec"] = (
            round(flops / per_step / 1e12, 1) if flops else None
        )
    return out


def _predict_section(psize: int, pb: int) -> dict:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from unet_embroidery_seg_tpu.models import build_model, init_model

    _, k_long, k_short = _knobs()
    pred_model = build_model("unet_resnet50", num_classes=2, dtype=jnp.bfloat16)
    variables = init_model(pred_model, jax.random.PRNGKey(0), (psize, psize))

    @jax.jit
    def pred_chain(variables, x):
        logits = pred_model.apply(variables, x, train=False)
        # softmax on device (predict.py computes it before the fetch); feed
        # a zero of it back so successive dispatches chain on each other.
        p = jax.nn.softmax(logits, axis=-1)
        return x + (p.mean() * 0.0).astype(x.dtype)

    x0 = np.random.RandomState(0).rand(pb, psize, psize, 3).astype(np.float32)
    xbox = [jax.device_put(x0)]

    def pstep():
        xbox[0] = pred_chain(variables, xbox[0])
        return xbox[0]

    per_img = _timed_chain(
        pstep, lambda y: float(y[0, 0, 0, 0]), k_long, k_short
    ) / pb

    row = {
        "device_ms_per_image": round(per_img * 1e3, 2),
        "images_per_sec": round(1.0 / per_img, 1),
    }
    if pb == 1:
        # End-to-end per-image wall time, reference predict.py style: one
        # dispatch + full softmax fetch per image (host-link bound here).
        pfn = jax.jit(
            lambda v, x: jax.nn.softmax(
                pred_model.apply(v, x, train=False), axis=-1
            )
        )
        np.asarray(pfn(variables, xbox[0]))  # compile + warmup
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            np.asarray(pfn(variables, xbox[0]))
        row["e2e_ms_per_image"] = round((time.perf_counter() - t0) / reps * 1e3, 1)
    return row


def _probe_section() -> dict:
    """Minimal reachability check: device enumeration + one tiny fetched
    matmul. Cheap on a healthy relay (shape is compile-cached); hangs only
    when the relay itself is hung — which is exactly what the supervisor's
    short timeout converts into a fast \"relay down\" verdict."""
    import jax
    import jax.numpy as jnp

    d = jax.devices()
    x = jnp.ones((128, 128), jnp.bfloat16)
    return {"ok": True, "platform": d[0].platform, "sum": float((x @ x).sum())}


def _ceiling_section() -> dict:
    import jax
    import jax.numpy as jnp

    n = 8192
    b = jnp.ones((n, n), jnp.bfloat16)
    c = [jnp.ones((n, n), jnp.bfloat16)]

    @jax.jit
    def mm(c, b):
        return jnp.tanh(c @ b)  # tanh breaks trivial CSE, cheap on VPU

    def step():
        c[0] = mm(c[0], b)
        return c[0]

    # Two-count subtraction at LARGE counts: a k-sweep (32..384, repo log
    # 2026-08-17) shows per-step time follows t_inf + C/k with C ~ 28 ms of
    # fixed dispatch/fetch offset, so a single k=96 rate is several percent
    # optimistic on a good run (and once measured ABOVE the 197 TF/s v5e
    # bf16 spec on a flaky one). (t(k2)-t(k1))/(k2-k1) cancels the offset;
    # median of 3 repeats rides out relay jitter. Converges to ~186 TF/s.
    float(step()[0, 0])  # compile + warmup

    def timed(k: int) -> float:
        float(step()[0, 0])  # settle; breaks the previous chain
        t0 = time.perf_counter()
        for _ in range(k):
            step()
        float(c[0][0, 0])
        return time.perf_counter() - t0

    k1, k2 = 96, 384
    ests = sorted((timed(k2) - timed(k1)) / (k2 - k1) for _ in range(3))
    per_step = ests[1]
    return {"matmul_ceiling_tflops": round(2 * n**3 / per_step / 1e12, 1)}


def run_section(spec: str) -> dict:
    kind, *args = spec.split(":")
    if kind == "train":
        # Optional trailing tokens: "f32" (compute dtype) and "w<mult>"
        # (decoder_width — the non-parity MXU-utilization row; a default
        # supervise() row since round 4, opt out with BENCH_W2=0).
        width = next(
            (float(a[1:]) for a in args[2:] if a.startswith("w")), 1.0
        )
        return _train_section(
            int(args[0]), args[1], "f32" in args[2:], decoder_width=width
        )
    if kind == "predict":
        return _predict_section(int(args[0]), int(args[1]))
    if kind == "ceiling":
        return _ceiling_section()
    if kind == "probe":
        return _probe_section()
    raise ValueError(f"unknown section {spec!r}")


# --------------------------------------------------------------------------
# Supervisor (pure Python — never touches the TPU, so it cannot be killed
# by the relay; assembles the one-line JSON from per-section subprocesses)
# --------------------------------------------------------------------------


class RelayDown(RuntimeError):
    """The TPU relay is unreachable (even a 128^2 matmul probe hangs)."""


def _relay_up(attempts: int = 2, budget: float | None = None) -> bool:
    """Fast reachability verdict so a hung relay (observed 2026-08-17: even
    ``jax.devices()`` blocks for hours) costs minutes, not
    retries*timeout*sections hours of dead subprocess timeouts.

    ``budget`` (seconds, from supervise()'s deadline reserve) caps the
    TOTAL probe time: a probe that cannot finish inside it is skipped and
    the relay is reported down — emitting the partial JSON line beats
    hanging in a probe past the driver's axe (the round-5 rehearsal caught
    exactly that: section timeout at the full deadline, then a 240 s
    verdict probe pushed past the outer kill → rc=124, no output)."""
    timeout = float(os.environ.get("BENCH_PROBE_TIMEOUT", "240"))
    env = dict(os.environ, BENCH_SECTION="probe")
    t0 = time.monotonic()
    for attempt in range(1, attempts + 1):
        probe_timeout = timeout
        if budget is not None:
            left = budget - (time.monotonic() - t0)
            if left < 25:
                _progress("probe: no budget left; assuming relay down")
                return False
            probe_timeout = min(timeout, left - 5)
        _progress(f"relay probe (attempt {attempt}/{attempts}, "
                  f"timeout {probe_timeout:.0f}s)")
        try:
            res = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True,
                timeout=probe_timeout,
                start_new_session=True,
            )
            if res.returncode == 0:
                return True
            _progress(f"probe rc={res.returncode} "
                      f"stderr_tail={res.stderr.strip()[-200:]!r}")
        except subprocess.TimeoutExpired:
            _progress(f"probe: timeout after {probe_timeout}s")
    return False


def _run_sub(spec: str, budget: float | None = None) -> dict | None:
    retries = int(os.environ.get("BENCH_RETRIES", "3"))
    # Default must exceed the observed worst-case fresh-shape cold compile
    # (>25 min through the remote-compile relay): killing a client
    # mid-cold-compile is what wedged the relay for 12+ h (tpu_backlog.sh).
    timeout = float(os.environ.get("BENCH_SECTION_TIMEOUT", "3600"))
    env = dict(os.environ, BENCH_SECTION=spec)
    t_begin = time.monotonic()
    for attempt in range(1, retries + 1):
        attempt_timeout = timeout
        if budget is not None:
            # Under a total deadline (driver mode) a section — retries
            # included — may not outlive the supervisor's remaining window:
            # better one killed section and a partial JSON line than an
            # rc=124 artifact with no output at all (BENCH_r04 post-mortem).
            left = budget - (time.monotonic() - t_begin)
            if left < 60:
                _progress(f"section {spec}: no budget left for attempt {attempt}")
                return None
            attempt_timeout = max(60.0, min(timeout, left))
        _progress(f"section {spec} (attempt {attempt}/{retries})")
        try:
            # Each section runs in its OWN session: the relay pool kills the
            # whole session of a client it times out mid-compile (observed:
            # supervisor + child both SIGKILLed with no traceback), so the
            # child must not share the supervisor's.
            res = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True,
                timeout=attempt_timeout, start_new_session=True,
            )
        except subprocess.TimeoutExpired:
            _progress(f"section {spec}: timeout after {attempt_timeout}s")
            # Distinguish "this compile was slow/flaky" (retry is useful)
            # from "the relay is gone" (every further attempt would burn the
            # full timeout for nothing — bail out across sections). The
            # verdict probe must fit the remaining budget: past it, report
            # down without probing so the JSON line still gets emitted. A
            # 60 s floor (carved from supervise()'s deadline reserve) keeps
            # the verdict honest when a section ate its whole budget but
            # the relay answers promptly.
            probe_budget = None
            if budget is not None:
                probe_budget = max(60.0, budget - (time.monotonic() - t_begin))
            if not _relay_up(attempts=1, budget=probe_budget):
                raise RelayDown(spec)
            continue
        lines = [l for l in res.stdout.strip().splitlines() if l.strip()]
        if res.returncode == 0 and lines:
            try:
                return json.loads(lines[-1])
            except json.JSONDecodeError:
                pass
        _progress(
            f"section {spec}: rc={res.returncode} "
            f"stderr_tail={res.stderr.strip()[-300:]!r}"
        )
    return None


def _last_known_good(here: str | None = None) -> dict | None:
    """Newest prior-round BENCH_r*.json with a real measurement.

    Attached (clearly labeled) to the error JSON when the relay is down at
    bench time, so the round artifact still references the established
    numbers instead of only a null.
    """
    import glob
    import re

    if here is None:
        here = os.path.dirname(os.path.abspath(__file__))
    best = None
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if "tail" in data and "value" not in data:
            # Driver wrapper format: the bench JSON is the last parseable
            # line of the captured stdout tail.
            for line in reversed(str(data["tail"]).strip().splitlines()):
                try:
                    data = json.loads(line)
                    break
                except json.JSONDecodeError:
                    continue
            else:
                continue
        if not isinstance(data, dict) or data.get("value") is None:
            continue
        rnd = int(m.group(1))
        if best is None or rnd > best[0]:
            best = (rnd, data)
    if best is None:
        return None
    rnd, data = best
    return {
        "source": f"BENCH_r{rnd:02d}.json",
        "metric": data.get("metric"),
        "value": data.get("value"),
        "unit": data.get("unit"),
        "ms_per_step": data.get("ms_per_step"),
        "model_tflops_per_sec": data.get("model_tflops_per_sec"),
        "pct_of_matmul_peak": data.get("pct_of_matmul_peak"),
    }


_LAST_FULL = "BENCH_LAST_FULL.json"


def _last_full_path() -> str:
    here = os.environ.get(
        "BENCH_LAST_FULL_DIR", os.path.dirname(os.path.abspath(__file__))
    )
    return os.path.join(here, _LAST_FULL)


def _read_last_full() -> dict | None:
    """Snapshot of the last COMPLETE sweep (written by supervise() whenever
    every requested section landed — typically a BENCH_FULL=1 run of
    scripts/tpu_backlog.sh). Used to annotate deadline-shed sections."""
    path = _last_full_path()
    try:
        with open(path) as f:
            data = json.load(f)
    except (OSError, json.JSONDecodeError):
        return None
    if isinstance(data, dict) and isinstance(data.get("result"), dict):
        return data
    return None


def supervise() -> None:
    t_start = time.monotonic()
    size = int(os.environ.get("BENCH_SIZE", "512"))
    batches = [int(b) for b in os.environ.get("BENCH_BATCHES", "8,16").split(",")]
    b0 = batches[0]
    # Total wall-clock deadline (round-5 fix: BENCH_r04 was rc=124 with NO
    # output because the ~11-section sweep had no total deadline). Sections
    # that don't fit are shed — loudly — and back-filled from the last
    # complete sweep's snapshot. BENCH_FULL=1 (tpu_backlog.sh / by hand)
    # disables the deadline and refreshes that snapshot on success.
    full = os.environ.get("BENCH_FULL", "0") == "1"
    deadline = float(
        os.environ.get("BENCH_DEADLINE", "0" if full else "1080") or 0
    )

    skipped: list[str] = []
    failed: list[str] = []

    # Finalization reserve: sections (and their verdict probes) only see
    # deadline − reserve, so the last section's timeout + a 60 s verdict
    # probe + the JSON emit all land INSIDE the deadline. Without it the
    # round-5 rehearsal overshot: headline timed out at the full 1080 s,
    # then the 240 s relay-verdict probe ran past the outer kill → rc=124
    # with no output (the exact BENCH_r04 failure mode this bounds).
    reserve = float(os.environ.get("BENCH_DEADLINE_RESERVE", "120"))

    def remaining() -> float | None:
        if not deadline:
            return None
        return (deadline - reserve) - (time.monotonic() - t_start)

    def run(spec: str) -> dict | None:
        rem = remaining()
        if rem is not None and rem < 90:
            skipped.append(spec)
            _progress(f"skipped (deadline): {spec} ({rem:.0f}s left)")
            return None
        t0 = time.monotonic()
        out = _run_sub(spec, budget=rem)
        _progress(
            f"section {spec} finished in {time.monotonic() - t0:.0f}s "
            f"(elapsed {time.monotonic() - t_start:.0f}s"
            + (f" of {deadline:.0f}s)" if deadline else ")")
        )
        if out is None:
            failed.append(spec)
        return out

    results: dict = {b: None for b in batches}
    lovasz = lovasz_f32 = w2 = predict_rows = ceiling_out = None
    relay_error = None

    baseline = None
    try:
        with open(os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")) as f:
            baseline = json.load(f)["torch_reference_cpu"]["images_per_sec"]
    except Exception:
        pass

    def assemble() -> dict:
        ceiling = ceiling_out["matmul_ceiling_tflops"] if ceiling_out else None
        head = results.get(b0) or {}
        ips = head.get("images_per_sec")
        tfs = head.get("model_tflops_per_sec")
        out = {
            "metric": f"train images/sec (unet_resnet50 bce {size}x{size} b{b0} bf16)",
            "value": ips,
            "unit": "images/sec",
            "vs_baseline": round(ips / baseline, 2) if ips and baseline else None,
            "ms_per_step": head.get("ms_per_step"),
            "model_tflops_per_sec": tfs,
            "matmul_ceiling_tflops": ceiling,
            "pct_of_matmul_peak": (
                round(100 * tfs / ceiling, 1) if tfs and ceiling else None
            ),
            "vs_baseline_note": "torch reference on this host is CPU-only; "
                                "pct_of_matmul_peak is the quality bar",
        }
        if relay_error:
            out["error"] = relay_error
            lkg = _last_known_good()
            if lkg:
                out["last_known_good"] = lkg
        for b in batches[1:]:
            if results.get(b) is not None:
                out[f"b{b}"] = results[b]
        if lovasz is not None:
            out["train_lovasz_bf16"] = lovasz
        if lovasz_f32 is not None:
            out["train_lovasz_f32"] = lovasz_f32
        if w2 is not None:
            tfs_w2 = w2.get("model_tflops_per_sec")
            if tfs_w2 and ceiling:
                w2["pct_of_matmul_peak"] = round(100 * tfs_w2 / ceiling, 1)
            out["train_decoder_width2"] = w2
        if predict_rows is not None:
            out["predict"] = predict_rows
            out["predict_note"] = (
                "device_ms_per_image = pure device time (incl. on-device "
                "softmax); e2e adds one dispatch + full softmax fetch "
                "(host-link bound here)"
            )
        return out

    try:
        if not _relay_up(budget=remaining()):
            raise RelayDown("initial probe")
        # Headline + ceiling first: together they are the whole quality bar
        # (img/s + % of the live-measured matmul peak) and must land even
        # under the tightest driver window.
        results[b0] = run(f"train:{b0}:bce")
        ceiling_out = run("ceiling")
        if deadline and results[b0]:
            # Provisional emit: if the driver's own timeout kills us during
            # an optional section below, the artifact still parses to the
            # fresh headline (the driver takes the last/only JSON line of
            # whatever stdout it captured).
            prov = assemble()
            prov["provisional"] = (
                "headline+ceiling only; optional sections still running"
            )
            print(json.dumps(prov, allow_nan=False), flush=True)
        # Optional rows, shed in reverse priority under the deadline:
        # predict (the north star's second half) > b16 > the lovasz pair
        # (CLI-default loss, both compute dtypes) > the opt-in w2 lever.
        if os.environ.get("BENCH_PREDICT", "1") != "0":
            predict_rows = {}
            for psize in dict.fromkeys((480, size)):
                for pb in dict.fromkeys((1, b0)):
                    predict_rows[f"b{pb}_{psize}"] = run(f"predict:{psize}:{pb}")
        for b in batches[1:]:
            results[b] = run(f"train:{b}:bce")
        if os.environ.get("BENCH_LOVASZ", "1") != "0":
            lovasz = run(f"train:{b0}:lovasz_hinge")
            # bf16 is the default for this config too (the round-3 f32 flip
            # was reverted by the matched-init study, PARITY.md) — keep the
            # f32 row measured anyway: it prices the `--no-amp` escape hatch
            # (1.48x step-time tax) next to the default.
            lovasz_f32 = run(f"train:{b0}:lovasz_hinge:f32")
        if os.environ.get("BENCH_W2", "1") != "0":
            # The opt-in --decoder-width 2.0 MXU-utilization lever, measured
            # next to the w1 parity row (the C=64 tail caps w1 at ~40% of
            # the matmul ceiling; the C=128 tail reaches ~68%).
            w2 = run(f"train:{b0}:bce:w2.0")
    except RelayDown as e:
        # Emit what we have, honestly flagged, instead of burning
        # retries*timeout on every remaining section of a hung relay.
        relay_error = f"tpu relay unreachable (probe hang at: {e})"
        _progress(relay_error)

    out = assemble()
    if skipped:
        out["sections_skipped_deadline"] = skipped
    if failed:
        out["sections_failed"] = failed
    if (skipped or failed) and not relay_error:
        snap = _read_last_full()
        if snap:
            fill = {
                k: v for k, v in snap["result"].items()
                if v is not None and out.get(k) is None
                and k not in ("metric", "unit", "vs_baseline_note",
                              "predict_note", "provisional",
                              "sections_skipped_deadline", "sections_failed",
                              "from_last_full")
            }
            if fill:
                out["from_last_full"] = {
                    "date": snap.get("date"),
                    "note": "sections shed under BENCH_DEADLINE; rows below "
                            "are from the last complete sweep",
                    **fill,
                }
    elif not (skipped or failed or relay_error) and out.get("value"):
        try:
            with open(_last_full_path(), "w") as f:
                json.dump(
                    {"date": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime()),
                     "result": out},
                    f, indent=1,
                )
        except OSError as e:
            _progress(f"could not write {_LAST_FULL}: {e}")
    print(json.dumps(out, allow_nan=False))


def main() -> None:
    # Hold the driver-busy sentinel so background measurement chains
    # (parity seeds, serving sweeps) pause between legs instead of
    # contending this one-core host during a driver check.
    from unet_embroidery_seg_tpu.utils.driver_gate import claim

    with claim():
        spec = os.environ.get("BENCH_SECTION")
        if spec:
            print(json.dumps(run_section(spec), allow_nan=False))
        else:
            supervise()


if __name__ == "__main__":
    main()
