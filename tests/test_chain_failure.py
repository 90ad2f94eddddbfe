"""chain_lib.sh: a failed leg must fail the whole chain, loudly.

Round-4 VERDICT weak #2: the finisher chain swallowed a crashed leg
(`|| true` everywhere) and still printed "complete". The shared leg runner
must (a) mark each leg PASS/FAIL, (b) keep running later legs, and
(c) exit non-zero when any leg failed — including the deliberately-broken
case the VERDICT asked to be tested.
"""

import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB = os.path.join(REPO, "scripts", "chain_lib.sh")


def _run_chain(body: str):
    script = f'source "{LIB}"\n{body}\nchain_summary\n'
    return subprocess.run(
        ["bash", "-c", script], capture_output=True, text=True
    )


def test_all_legs_pass_exits_zero():
    res = _run_chain('leg "a" true\nleg "b" echo hi')
    assert res.returncode == 0, res.stdout + res.stderr
    assert "PASS  a" in res.stdout and "PASS  b" in res.stdout
    assert "CHAIN COMPLETE: all 2 leg(s) passed" in res.stdout


def test_deliberately_broken_leg_fails_the_chain():
    res = _run_chain('leg "good" true\nleg "broken" false\nleg "after" true')
    assert res.returncode != 0
    assert "LEG [broken] FAILED rc=1" in res.stdout
    assert "FAIL  broken" in res.stdout
    assert "CHAIN FAILED: 1 leg(s) failed" in res.stdout
    # Later legs still ran (salvage independent measurements).
    assert "PASS  after" in res.stdout
    assert "CHAIN COMPLETE" not in res.stdout


def test_crashing_command_is_a_failure_not_a_chain_abort():
    # A leg whose command dies (missing file -> rc=127) must be recorded,
    # not abort the chain before the summary.
    res = _run_chain('leg "crash" /nonexistent/binary\nleg "tail" true')
    assert res.returncode != 0
    assert "FAIL  crash" in res.stdout
    assert "PASS  tail" in res.stdout


def test_round5_chain_uses_the_lib():
    # The live chain must source chain_lib and end with chain_summary —
    # no leg may be silenced with `|| true`.
    chain = os.path.join(REPO, "scripts", "round5_chain.sh")
    text = open(chain).read()
    assert "chain_lib.sh" in text
    assert "chain_summary" in text.splitlines()[-1] or text.rstrip().endswith(
        "chain_summary"
    )
    assert "|| true" not in text
