"""Host-phase probe: effective parallel CPU capacity right now.

This host's multi-core capacity swings 2-4x between phases while
single-thread speed stays flat (r15: a full bench measured 375 s vs
209 s on identical code an hour apart; untouched entries were 1.5-9x
inflated while a single-thread kernel probe read normal). Run this
BEFORE any suite-level timing: ~25 effective cores = healthy window,
<10 = wait. Uses processes (hashlib under 2048-byte updates holds the
GIL, so a thread probe lies).

Usage: python scripts/host_probe.py
"""

import hashlib
import time
from concurrent.futures import ProcessPoolExecutor


def spin(n: int) -> str:
    h = hashlib.md5()
    b = b"x" * 8192
    for _ in range(n):
        h.update(b)
    return h.hexdigest()


def main() -> None:
    n = 60000
    t0 = time.time()
    spin(n)
    single = time.time() - t0
    t0 = time.time()
    with ProcessPoolExecutor(max_workers=32) as ex:
        list(ex.map(spin, [n] * 32))
    par = time.time() - t0
    print(
        f"single: {single:.2f}s  32x procs: {par:.2f}s  "
        f"effective cores = {32 * single / par:.1f}"
    )


if __name__ == "__main__":
    main()
