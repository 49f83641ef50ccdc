"""Probe: serving cold start — fresh process to first interactive frame.

CLAUDE.md documents ~8 min of non-persistable TPU compiles per fresh
full-size process; this measures that deployment cost end-to-end for
``python -m deepv_tpu.serve`` (VERDICT r3 #7) and proves the pre-warm story:
the port must stay closed until the chip is ready, and the first client
/step must then be fast.

Reports:
  t_port_open_s   process spawn -> port accepting connections
                  (weight init + session-path compile via serve.prewarm)
  t_session_s     port open -> POST /session response
  t_first_step_s  session created -> first /step response (the first
                  interactive frame; with prewarm this is steady-state fast)

Run exclusively (fresh subprocess owns the TPU tunnel). ~10-15 min.
"""

import json
import os
import socket
import subprocess
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def wait_port(port: int, proc, timeout_s: float) -> float:
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        if proc.poll() is not None:
            raise RuntimeError(f"serve exited rc={proc.returncode}")
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=1):
                return time.time() - t0
        except OSError:
            time.sleep(2.0)
    raise TimeoutError(f"port {port} not open after {timeout_s}s")


def post(port: int, path: str, obj: dict, timeout_s: float = 600) -> dict:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout_s) as r:
        return json.loads(r.read())


def main():
    port = 8693
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/deepv_jax_bench_cache")
    t_spawn = time.time()
    proc = subprocess.Popen(
        [sys.executable, "-m", "deepv_tpu.serve", "--model_path", "/tmp/nock",
         "--random_weights", "--port", str(port)],
        cwd=REPO, env=env, stdout=sys.stderr, stderr=sys.stderr)
    try:
        t_port = wait_port(port, proc, timeout_s=1500)
        print(f"[probe] port open after {t_port:.1f}s (spawn -> accepting)")

        import numpy as np
        img = (np.random.default_rng(0)
               .uniform(-1, 1, (1, 3, 384, 512)).astype(np.float32))
        import base64
        img_b64 = {"shape": list(img.shape), "dtype": "float32",
                   "data": base64.b64encode(img.tobytes()).decode()}
        t0 = time.time()
        sid = post(port, "/session", {"image": img_b64, "seed": 0})["session_id"]
        t_sess = time.time() - t0
        t0 = time.time()
        out = post(port, "/step",
                   {"session_id": sid,
                    "action": "Move forward. The perspective hasn't changed."})
        t_step = time.time() - t0
        print(f"[probe] session {t_sess:.2f}s, first step {t_step:.2f}s "
              f"(frames_total={out['frames_total']})")
        print(json.dumps({"t_port_open_s": round(t_port, 1),
                          "t_session_s": round(t_sess, 2),
                          "t_first_step_s": round(t_step, 2)}))
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


if __name__ == "__main__":
    main()
