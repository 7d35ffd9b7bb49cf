"""TPU-claim health probe for remote-attached (relay) devices.

A dead client can keep holding the device grant, making every new claim
queue forever inside ``make_c_api_client`` — from the outside this looks
like ``import jax; jax.devices()`` hanging with no output.  This probe
answers "is the device reachable right now?" WITHOUT risking the calling
process:

  * backend init runs in a subprocess with a generous timeout (healthy init
    is seconds; remote COMPILES are the slow part, not the claim);
  * on timeout the subprocess's own stack is dumped via faulthandler so the
    hang site is visible (make_c_api_client == wedged claim);
  * the parent never touches the backend.

Usage:
    python scripts/probe_tpu.py [--timeout 540] [--op]

``--op`` additionally runs one tiny matmul and reads back 4 bytes — proves
the compile relay works too, not just the claim.

Protocol when wedged (hard-won, see PERFORMANCE.md "measurement
methodology"): do NOT stack short-timeout retries (each probe re-enqueues a
claim); give every real TPU command a timeout longer than worst-case remote
compile; prefer one long-running process over many short ones.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time

_CHILD = r"""
import faulthandler, sys
faulthandler.dump_traceback_later({budget}, exit=True)
import jax
devs = jax.devices()
print("devices:", devs, flush=True)
if {op!r}:
    import jax.numpy as jnp
    x = jnp.ones((128, 128))
    print("matmul sum:", float((x @ x).sum()), flush=True)
print("PROBE_OK", flush=True)
"""


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--timeout", type=float, default=540.0)
    ap.add_argument("--op", action="store_true",
                    help="also run one op through the compile relay")
    args = ap.parse_args()

    code = _CHILD.format(budget=max(args.timeout - 20.0, 10.0), op=bool(args.op))
    t0 = time.time()
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], timeout=args.timeout,
            capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired as exc:
        print((exc.stdout or b"").decode() if isinstance(exc.stdout, bytes) else (exc.stdout or ""))
        print(f"WEDGED: no backend init in {args.timeout:.0f}s", file=sys.stderr)
        return 2
    dt = time.time() - t0
    sys.stdout.write(r.stdout)
    if "PROBE_OK" in r.stdout:
        print(f"REACHABLE in {dt:.1f}s")
        return 0
    sys.stderr.write(r.stderr[-2000:])
    print(f"FAILED (rc={r.returncode}, {dt:.1f}s) — faulthandler dump above "
          "shows the hang site (make_c_api_client == wedged claim)", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
