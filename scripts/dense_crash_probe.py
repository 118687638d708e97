"""dense_schur stability probe (VERDICT round-2 item #3).

Round 2 reported: dense_schur EXECUTION at 550 cams reliably wedges
the tunneled TPU worker for 20-40 min (275 cams runs clean at 15
iters/s; the suspect stage was never isolated past "worker wedged").
Round 3 rewrote the entire per-observation path to flat (M, F)
layouts, which removes the giant tile-padded temporaries that were the
prime suspects — this probe re-tests the ladder 275 -> 400 -> 550 and,
on success, repeats 550 three times (the VERDICT's done criterion).

Each attempt runs scripts/bench_probe.py in a subprocess with a hard
timeout; a timeout is recorded as a wedge and the ladder stops (the
worker needs its recovery window).

Run: python scripts/dense_crash_probe.py
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROBE = ("import jax, jax.numpy as jnp; "
         "x = jnp.ones((128, 128)); print(float((x @ x).sum()))")


def tpu_alive(timeout=240):
    try:
        out = subprocess.run([sys.executable, "-c", PROBE],
                             capture_output=True, text=True,
                             timeout=timeout, cwd=HERE)
        return "2097152.0" in out.stdout
    except subprocess.TimeoutExpired:
        return False


def attempt(n_cams, n_pts, timeout=900):
    t0 = time.time()
    try:
        out = subprocess.run(
            [sys.executable,
             os.path.join(HERE, "scripts", "bench_probe.py"),
             str(n_cams), str(n_pts), "dense_schur", "10", "2"],
            capture_output=True, text=True, timeout=timeout, cwd=HERE)
    except subprocess.TimeoutExpired:
        return {"n_cams": n_cams, "status": "TIMEOUT/wedge",
                "elapsed_s": round(time.time() - t0, 1)}
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            d = json.loads(line)
            if d.get("ok"):
                return {"n_cams": n_cams, "status": "ok",
                        "iters_per_sec": d["iters_per_sec"],
                        "compile_s": d["compile_s"],
                        "elapsed_s": round(time.time() - t0, 1)}
        except (json.JSONDecodeError, ValueError):
            continue
    return {"n_cams": n_cams, "status": "crashed",
            "tail": out.stdout.strip().splitlines()[-3:],
            "elapsed_s": round(time.time() - t0, 1)}


def main():
    results = []
    ladder = [(275, 70_000), (400, 100_000), (550, 140_000)]
    for n_cams, n_pts in ladder:
        if not tpu_alive():
            results.append({"n_cams": n_cams,
                            "status": "tpu not alive, skipped"})
            break
        r = attempt(n_cams, n_pts)
        results.append(r)
        print(json.dumps(r), flush=True)
        if r["status"] != "ok":
            break
    # done criterion: 3 consecutive clean 550 runs
    if results and results[-1].get("status") == "ok" and \
            results[-1]["n_cams"] == 550:
        for i in range(2):
            if not tpu_alive():
                break
            r = attempt(550, 140_000)
            r["repeat"] = i + 2
            results.append(r)
            print(json.dumps(r), flush=True)
            if r["status"] != "ok":
                break
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
