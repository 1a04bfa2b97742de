"""Bounded accelerator-availability probe.

Why this exists: when the session's accelerator is reached through a
network tunnel (the ``axon`` PJRT platform here), a dead tunnel makes
the first backend initialisation block forever inside the PJRT C client
— uninterruptible from Python signal handlers, so an affected process
can only be killed from outside. Every chip-bound CLI entry point calls
:func:`ensure_device_available` first, which runs ``jax.devices()`` in a
killable SUBPROCESS with a timeout and turns an unreachable device into
a clear error instead of an indefinite silent hang. (The reference has
no equivalent because eager CUDA either sees a GPU or raises
immediately; a remote-device runtime needs the probe.)

Skip knobs: a ``cpu``-first ``JAX_PLATFORMS`` needs no probe (local
backend), and ``TPGAN_SKIP_DEVICE_CHECK=1`` bypasses it entirely
(e.g. under a supervisor that already health-checks the tunnel).
"""

from __future__ import annotations

import os
import subprocess
import sys


class DeviceUnavailableError(RuntimeError):
    pass


def device_available(timeout_s: float = 150.0) -> bool:
    """True iff a fresh interpreter can enumerate JAX devices within
    ``timeout_s``. Runs in a subprocess so a hung PJRT init is killed
    rather than inherited."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False
    except Exception:
        return False


def ensure_device_available(timeout_s: float = 150.0) -> None:
    """Raise :class:`DeviceUnavailableError` with an actionable message
    when the accelerator backend is unreachable. No-ops when the probe
    is skippable (local CPU platform or explicit env opt-out)."""
    if os.environ.get("TPGAN_SKIP_DEVICE_CHECK") == "1":
        return
    platforms = os.environ.get("JAX_PLATFORMS", "")
    if platforms.split(",")[0].strip() == "cpu":
        return
    if not device_available(timeout_s):
        raise DeviceUnavailableError(
            f"no usable JAX device backend within {timeout_s:.0f}s — the "
            "accelerator (or its tunnel) looks unreachable. Retry later, "
            "run on CPU with JAX_PLATFORMS=cpu, or set "
            "TPGAN_SKIP_DEVICE_CHECK=1 to bypass this probe."
        )
