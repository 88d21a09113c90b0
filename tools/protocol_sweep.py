"""Reference-protocol sweep driver with tunnel-stall resilience.

Runs tools/evaluate.py once per sequence (5 runs in-process so jit
compiles amortize), full-length from frame 0, and watches each child's
output file: if it stops growing for --stall seconds the child is killed
and retried once (the dev tunnel intermittently wedges a transfer; a
wedged child would otherwise eat the whole sweep budget).

Ref protocol: /root/reference/gmmloc_ros/scripts/evaluate_euroc.sh
(5 runs x sequence, offline single-thread, TUM export + evo APE).

Usage:
  python tools/protocol_sweep.py --out expr_r3 [--runs 5] [--seqs all]
                                 [--extra "--fused 1 --pipelined 1"]
"""

import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmmloc_tpu.utils.tpuenv import fast_tpu_child_env

ALL_SEQS = [
    "V1_01_easy", "V1_02_medium", "V1_03_difficult",
    "V2_01_easy", "V2_02_medium", "V2_03_difficult",
]


def run_sequence(seq, args, attempt):
    out_dir = os.path.join(args.out, seq)
    os.makedirs(out_dir, exist_ok=True)
    log_path = os.path.join(out_dir, f"sweep_log{attempt}.txt")
    cmd = [
        sys.executable, "tools/evaluate.py",
        "--runs", str(args.runs), "--frames", str(args.frames),
        "--start", str(args.start), "--seqs", seq, "--out", out_dir,
    ] + (args.extra.split() if args.extra else [])
    log = open(log_path, "w", buffering=1)
    t0 = time.time()
    proc = subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT,
                            env=fast_tpu_child_env(),
                            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    last_size, last_change = -1, time.time()
    while proc.poll() is None:
        time.sleep(10)
        try:
            size = os.path.getsize(log_path)
        except OSError:
            size = 0
        if size != last_size:
            last_size, last_change = size, time.time()
        stalled = time.time() - last_change > args.stall
        overtime = time.time() - t0 > args.seq_budget
        if stalled or overtime:
            proc.kill()
            proc.wait()
            log.write(f"\n[sweep] killed: {'stall' if stalled else 'budget'}"
                      f" after {time.time() - t0:.0f}s\n")
            return False
    return proc.returncode == 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="expr_r3")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--frames", type=int, default=99999)
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--seqs", default="all")
    ap.add_argument("--extra", default="--fused 1 --pipelined 1")
    ap.add_argument("--stall", type=float, default=1500.0,
                    help="kill the child if its log stops growing this long"
                         " (first-run compiles through the tunnel print "
                         "nothing for 8-15 min on a bad day)")
    ap.add_argument("--seq_budget", type=float, default=4800.0,
                    help="hard wall-clock cap per sequence")
    args = ap.parse_args()
    seqs = ALL_SEQS if args.seqs == "all" else args.seqs.split(",")
    os.makedirs(args.out, exist_ok=True)
    status = {}
    for seq in seqs:
        t0 = time.time()
        ok = run_sequence(seq, args, 0)
        if not ok:
            print(f"[sweep] {seq}: retrying after stall/failure", flush=True)
            ok = run_sequence(seq, args, 1)
        status[seq] = ok
        print(f"[sweep] {seq}: {'ok' if ok else 'FAILED'} "
              f"({time.time() - t0:.0f}s)", flush=True)
    print("[sweep] done:", status, flush=True)
    sys.exit(0 if all(status.values()) else 1)


if __name__ == "__main__":
    main()
