"""Persistent warm-TPU job runner.

Polls /tmp/tpujobs/ for files named job-*.py (ordered), executes each in this
process's globals, writes stdout+traceback to <job>.log, then renames the job
to <job>.done. Keeps the expensive axon/Pallas warmup paid exactly once.
"""

import io
import os
import sys
import time
import traceback
import contextlib

sys.path.insert(0, "/root/repo")

JOBS = "/tmp/tpujobs"
os.makedirs(JOBS, exist_ok=True)

exec(open("/root/repo/scratch/warm.py").read())  # noqa: S102 - our own file

GLOBALS = globals()

print("jobrunner: polling", JOBS, flush=True)
while True:
    jobs = sorted(f for f in os.listdir(JOBS) if f.startswith("job-") and f.endswith(".py"))
    if not jobs:
        time.sleep(0.5)
        continue
    name = jobs[0]
    path = os.path.join(JOBS, name)
    logp = path + ".log"
    buf = io.StringIO()
    t0 = time.time()
    try:
        with open(path) as f:
            src = f.read()
        with contextlib.redirect_stdout(buf):
            exec(compile(src, path, "exec"), GLOBALS)
        status = "ok"
    except BaseException:
        buf.write(traceback.format_exc())
        status = "fail"
    buf.write(f"\n[{status} in {time.time()-t0:.1f}s]\n")
    with open(logp, "w") as f:
        f.write(buf.getvalue())
    os.rename(path, path + ".done")
    print(f"jobrunner: {name} -> {status}", flush=True)
