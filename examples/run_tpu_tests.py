"""`make tpu-test` entry: run the hardware-only test subset (the
``tpu_only`` Pallas PRNG tests + the on-chip statistical/guided-CSIS tests)
against the real attached TPU, and record the pass as a committed round
artifact (VERDICT r3 item 6 — "run the TPU-only test subset on the chip and
record it").

Usage: python examples/run_tpu_tests.py [--out TPU_TEST_r05.json]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FILES = ["tests/test_pallas.py", "tests/test_tpu_hw.py"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "TPU_TEST_r05.json"))
    ap.add_argument("--timeout", type=int, default=1800)
    args = ap.parse_args()

    env = dict(os.environ, CPPROB_TPU_TESTS="1")
    device = subprocess.run(
        [sys.executable, "-c",
         "import jax; print(jax.devices()[0], jax.default_backend())"],
        env=env, capture_output=True, text=True, timeout=120, cwd=REPO,
    ).stdout.strip()

    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", *FILES, "-q", "-rs", "--tb=short"],
        cwd=REPO, env=env, capture_output=True, text=True,
        timeout=args.timeout,
    )
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    out = {
        "versions": __import__("cpprob_tpu.util.profiling", fromlist=["env_versions"]).env_versions(),
        "artifact": "TPU-hardware test subset (make tpu-test)",
        "files": FILES,
        "device": device,
        "exit_code": proc.returncode,
        "passed": proc.returncode == 0,
        "summary": lines[-1] if lines else "",
        "wall_s": round(time.time() - t0, 1),
        "output_tail": "\n".join(lines[-15:]),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(proc.stdout[-2000:], file=sys.stderr)
    print(f"wrote {args.out}", file=sys.stderr)
    return proc.returncode


if __name__ == "__main__":
    raise SystemExit(main())
