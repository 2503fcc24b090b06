"""Backend bring-up resilience.

This environment reaches its TPU through a relay whose registration can fail
transiently (the previous process may still hold the chip grant, and the
sitecustomize hook swallows the error, leaving the 'axon' platform
unregistered). ``ensure_backend`` detects that state and re-execs the
process until the claim succeeds.
"""

from __future__ import annotations

import os
import sys
import time

import jax


def ensure_backend(retries: int = 12, delay_s: float = 30.0) -> None:
    """Block until ``jax.devices()`` works; re-exec on transient axon
    registration failures with exponential backoff (the relay lockout after
    a lost grant lasts on the order of 10 minutes). No-op on healthy
    backends (cpu/tpu)."""
    attempt = int(os.environ.get("_TOT_BACKEND_ATTEMPT", "0"))
    try:
        jax.devices()
        return
    except RuntimeError as e:
        if "axon" not in str(e) or attempt >= retries:
            raise
        time.sleep(min(delay_s * (1.6 ** attempt), 300.0))
        os.environ["_TOT_BACKEND_ATTEMPT"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)
