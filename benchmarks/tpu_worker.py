#!/usr/bin/env python
"""Persistent TPU benchmark worker.

The dev tunnel charges ~5 minutes of startup per Python process; this
worker pays it once and then executes job files.  Protocol: drop
``NNN.py`` into the job dir; the worker execs it (shared namespace across
jobs, so matrices/compiled fns persist), writes stdout+traceback to
``NNN.out`` and touches ``NNN.done``.  Drop ``stop`` to exit.
"""

import io
import os
import signal
import sys
import time
import traceback
from contextlib import redirect_stderr, redirect_stdout

sys.path.insert(0, ".")

JOB_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_jobs"
os.makedirs(JOB_DIR, exist_ok=True)

import jax  # noqa: E402

print(f"worker ready: {jax.devices()}", flush=True)
namespace: dict = {"jax": jax}

JOB_TIMEOUT = int(os.environ.get("TPU_JOB_TIMEOUT", "2400"))


class _JobTimeout(Exception):
    pass


def _alarm(signum, frame):
    raise _JobTimeout(f"job exceeded {JOB_TIMEOUT}s")


signal.signal(signal.SIGALRM, _alarm)

# done-tracking survives worker restarts via the .done marker files
done = {f[:-5] + ".py" for f in os.listdir(JOB_DIR) if f.endswith(".done")}
while True:
    if os.path.exists(os.path.join(JOB_DIR, "stop")):
        print("worker stopping", flush=True)
        break
    jobs = sorted(f for f in os.listdir(JOB_DIR)
                  if f.endswith(".py") and f not in done)
    for job in jobs:
        path = os.path.join(JOB_DIR, job)
        outp = path[:-3] + ".out"
        buf = io.StringIO()
        t0 = time.time()
        try:
            with open(path) as f:
                code = f.read()
            signal.alarm(JOB_TIMEOUT)
            try:
                with redirect_stdout(buf), redirect_stderr(buf):
                    exec(compile(code, path, "exec"), namespace)
            finally:
                signal.alarm(0)
            status = "ok"
        except BaseException:
            buf.write(traceback.format_exc())
            status = "error"
        with open(outp, "w") as f:
            f.write(buf.getvalue())
            f.write(f"\n[{status} in {time.time() - t0:.1f}s]\n")
        open(path[:-3] + ".done", "w").close()
        done.add(job)
        print(f"job {job}: {status}", flush=True)
    time.sleep(0.5)
