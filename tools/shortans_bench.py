#!/usr/bin/env python
"""Short-answer operating-point sweep with a window-health control gate.

The reference's AVS/MS3 and `itisseg` task families answer "it is [SEG]."
(~6 tokens, near-zero prompt echo — `/root/reference/utils/avsbench.py:503-509`),
so real short answers finish in ~12 decode tokens but accept fewer
tokens/pass than prompt-echoing referring answers. This sweep measures
that regime (decode12, acceptance k in {2,4,8}) on the device-program
bench (VERDICT r4 #4... the last unmeasured operating family).

The shared axon chip serves multi-hour degraded-tunnel windows (slow
dispatch, chip fine — BASELINE.md "Chip-health gating"): a short-answer
number taken in one would understate the code by ~3x. So every sweep is
BRACKETED by decode32 k=8 batch2 controls — the operating point with a
known-healthy recorded value (7.417 q/s, BENCH_r04.json) — and the sweep
only records when the opening control clears CONTROL_MIN (default 6.5).
Both controls land in the artifact so a recorded sweep carries its own
window evidence.

Usage: python tools/shortans_bench.py [SHORTANS_r05.jsonl]
Env: SHORTANS_CONTROL_MIN, SHORTANS_WINDOW_WAIT_S (sleep between window
probes, default 300), SHORTANS_MAX_PROBES (default 6).
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(tag, deadline_s=600, attempts=2, **env_overrides):
    env = dict(os.environ, BENCH_DEADLINE_S=str(deadline_s),
               BENCH_ATTEMPTS=str(attempts))
    env.update({k: str(v) for k, v in env_overrides.items()})
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")], env=env,
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, timeout=deadline_s * attempts + 300)
    except subprocess.TimeoutExpired:
        sys.stderr.write(f"[{tag}] launcher itself timed out\n")
        return None
    line = next((ln for ln in proc.stdout.splitlines()
                 if ln.startswith("{")), None)
    if line is None:
        sys.stderr.write(f"[{tag}] no result: {proc.stderr[-300:]}\n")
        return None
    rec = json.loads(line)
    rec["tag"] = tag
    rec["wall_s"] = round(time.time() - t0, 1)
    sys.stderr.write(f"[{tag}] {rec['value']} q/s "
                     f"(p50 {rec.get('p50_ms')} ms, "
                     f"hbm {rec.get('hbm_gbps')})\n")
    return rec


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    control_min = float(os.environ.get("SHORTANS_CONTROL_MIN", "6.5"))
    wait_s = int(os.environ.get("SHORTANS_WINDOW_WAIT_S", "300"))
    max_probes = int(os.environ.get("SHORTANS_MAX_PROBES", "6"))

    control_env = dict(BENCH_DECODE_TOKENS=32, BENCH_FORCE_ACCEPT=8,
                       BENCH_BATCH=2)
    rows = []
    opening = None
    for probe in range(max_probes):
        opening = run_bench("control_open", deadline_s=450, attempts=1,
                            **control_env)
        if opening is not None and opening["value"] >= control_min:
            break
        got = "none" if opening is None else opening["value"]
        sys.stderr.write(f"window degraded (control {got} < {control_min}),"
                         f" probe {probe + 1}/{max_probes}; "
                         f"sleeping {wait_s}s\n")
        opening = None
        time.sleep(wait_s)
    if opening is None:
        sys.stderr.write("no healthy window found; not recording\n")
        sys.exit(3)
    rows.append(opening)

    sweep = [
        ("decode12_k2_b2", dict(BENCH_DECODE_TOKENS=12, BENCH_FORCE_ACCEPT=2,
                                BENCH_BATCH=2)),
        ("decode12_k4_b2", dict(BENCH_DECODE_TOKENS=12, BENCH_FORCE_ACCEPT=4,
                                BENCH_BATCH=2)),
        ("decode12_k8_b2", dict(BENCH_DECODE_TOKENS=12, BENCH_FORCE_ACCEPT=8,
                                BENCH_BATCH=2)),
        ("decode12_k4_b1", dict(BENCH_DECODE_TOKENS=12, BENCH_FORCE_ACCEPT=4,
                                BENCH_BATCH=1)),
    ]
    for tag, envo in sweep:
        # single long attempt: a fresh 7B compile through the shared
        # remote-compile service can take ~10 min in congested periods
        # (the decode32 control is compile-cached and doesn't pay this);
        # retrying a killed compile restarts it from scratch, so one
        # 1500 s attempt beats two 600 s ones
        rec = run_bench(tag, deadline_s=1500, attempts=1, **envo)
        if rec is not None:
            rows.append(rec)

    closing = run_bench("control_close", deadline_s=450, attempts=1,
                        **control_env)
    if closing is not None:
        rows.append(closing)

    out = "\n".join(json.dumps(r) for r in rows) + "\n"
    sys.stdout.write(out)
    if out_path:
        with open(out_path, "w") as f:
            f.write(out)


if __name__ == "__main__":
    main()
