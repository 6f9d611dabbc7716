"""Supervised serving: heartbeat-based failure detection + restart.

The reference has no serving stack at all (SURVEY §5.3 marks failure
detection/elastic recovery absent); this closes the auxiliary subsystem
for the serving side:

* the serve process touches a **heartbeat file** every scheduler tick
  (``GPTQ_SERVE_HEARTBEAT`` env, wired below) and writes a **state
  snapshot** of all unfinished requests every N ticks
  (``Engine.run(snapshot_path=...)``);
* this supervisor launches ``gptq_v2_tpu.serve`` as a subprocess, kills
  it if the heartbeat goes stale (hung device dispatch, tunnel outage,
  OOM-wedged runtime), and restarts it; on restart the serve process
  resumes from the snapshot (``Engine.restore_requests``) — accepted
  work survives, greedy requests finish token-identically
  (re-prefilling ``prompt + emitted`` reconstructs the lost KV cache).

Usage::

    python scripts/serve_supervised.py --stale-after 120 -- \
        python -m gptq_v2_tpu.serve --model-dir ... --results ...

Exit code is the child's once it completes without a stall.
"""
import argparse
import os
import signal
import subprocess
import sys
import tempfile
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--stale-after", type=float, default=120.0,
                    help="seconds without a heartbeat before restart")
    ap.add_argument("--max-restarts", type=int, default=5)
    ap.add_argument("--poll", type=float, default=2.0)
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- then the serve command line")
    args = ap.parse_args(argv)
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    assert cmd, "pass the serve command after --"

    hb = os.path.join(tempfile.mkdtemp(prefix="gptq_serve_"), "heartbeat")
    env = dict(os.environ, GPTQ_SERVE_HEARTBEAT=hb)

    for attempt in range(args.max_restarts + 1):
        open(hb, "w").close()
        proc = subprocess.Popen(cmd, env=env, start_new_session=True)
        stalled = False
        while True:
            rc = proc.poll()
            if rc is not None:
                if rc == 0 or attempt == args.max_restarts:
                    return rc
                print(f"supervisor: child exited rc={rc}; restarting "
                      f"({attempt + 1}/{args.max_restarts})", file=sys.stderr)
                break
            age = time.time() - os.path.getmtime(hb)
            if age > args.stale_after:
                print(f"supervisor: heartbeat stale {age:.0f}s; killing pid "
                      f"{proc.pid} and restarting "
                      f"({attempt + 1}/{args.max_restarts})", file=sys.stderr)
                # kill the exact process group we started — never by pattern
                os.killpg(proc.pid, signal.SIGKILL)
                proc.wait()
                stalled = True
                break
            time.sleep(args.poll)
        if not stalled and proc.returncode == 0:
            return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
