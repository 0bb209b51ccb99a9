"""Persistent TPU job worker.

The axon TPU tunnel wedges for a long time whenever a client process exits
uncleanly (and sometimes even on clean exit mid-queue), so all TPU work runs
through this single long-lived process.  It polls a job directory for *.py
files, exec()s them in a shared namespace (jax/device state persists across
jobs), and writes stdout+traceback to <job>.out, then renames the job to
<job>.done.

Usage:
    nohup python -u tools/tpu_worker.py /tmp/tpu_jobs > /tmp/tpu_worker.log 2>&1 &
    cp myjob.py /tmp/tpu_jobs/  # result appears at /tmp/tpu_jobs/myjob.py.out
"""
import io
import contextlib
import os
import sys
import time
import traceback

job_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_jobs"
os.makedirs(job_dir, exist_ok=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

print("worker ready, devices:", jax.devices(), flush=True)

SHARED: dict = {"__name__": "__tpu_job__"}

while True:
    # clean shutdown request (touch <job_dir>/STOP): finish nothing new and
    # exit, releasing the device before e.g. a driver bench snapshot
    if os.path.exists(os.path.join(job_dir, "STOP")):
        os.remove(os.path.join(job_dir, "STOP"))
        print("STOP requested, exiting", flush=True)
        break
    jobs = sorted(f for f in os.listdir(job_dir)
                  if f.endswith(".py") and not f.endswith(".done.py"))
    if not jobs:
        time.sleep(1.0)
        continue
    job = os.path.join(job_dir, jobs[0])
    out_path = job + ".out"
    print("running", job, flush=True)
    # always pick up fresh library code (the worker process is long-lived)
    for mod in [m for m in list(sys.modules) if m.startswith("atlasqtl_tpu")]:
        del sys.modules[mod]
    # drop the previous job's globals so device buffers are freed
    SHARED.clear()
    SHARED["__name__"] = "__tpu_job__"
    import gc
    gc.collect()
    buf = io.StringIO()
    t0 = time.time()
    try:
        with open(job) as fh:
            code = fh.read()
        with contextlib.redirect_stdout(buf):
            exec(compile(code, job, "exec"), SHARED)
        status = "OK"
    except BaseException:
        buf.write("\n" + traceback.format_exc())
        status = "ERROR"
    with open(out_path, "w") as fh:
        fh.write(f"# status: {status} elapsed: {time.time()-t0:.1f}s\n")
        fh.write(buf.getvalue())
    os.replace(job, job + ".done")
    print("finished", job, status, flush=True)
