"""Development-tunnel environment hygiene for TPU entry points.

The dev tunnel's default device-side compile path makes the FIRST
execution of every new executable pay a 2-5 minute program load
(measured: a trivial 8x8 elementwise jit = 120 s to first result, while
XLA itself compiled it in 0.37 s). With terminal-side compilation
(PALLAS_AXON_REMOTE_COMPILE=1) the same first execution is ~0.5 s and
steady-state dispatch/fetch latency is unchanged.

The flag is read by sitecustomize at interpreter start, before any user
code runs, so setting os.environ in-process is too late — entry points
call `ensure_fast_tpu_env()` FIRST (before importing jax), and it
re-execs the interpreter once with the flag set.
"""

import os
import sys

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def ensure_fast_tpu_env() -> None:
    """Re-exec with PALLAS_AXON_REMOTE_COMPILE=1 (+ persistent compile
    cache) when targeting the axon TPU tunnel. No-op on other platforms
    or when already set."""
    if (
        os.environ.get("JAX_PLATFORMS", "") == "axon"
        and os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1"
    ):
        os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "1"
        _set_cache_env(os.environ)
        os.execv(sys.executable, [sys.executable] + sys.argv)


def _set_cache_env(env) -> None:
    # NOTE: the persistent compilation cache (JAX_COMPILATION_CACHE_DIR)
    # is deliberately NOT enabled on the axon tunnel: executable
    # serialization through the relay was observed to stall runs for
    # minutes per kernel without producing cache entries. Terminal-side
    # compile alone cuts first-execution from 2-5 min to sub-second;
    # per-process warmup (pipeline prewarm) covers the rest.
    env.pop("JAX_COMPILATION_CACHE_DIR", None)


def fast_tpu_child_env() -> dict:
    """Environment for child processes that will touch the TPU."""
    env = dict(os.environ)
    env["PALLAS_AXON_REMOTE_COMPILE"] = "1"
    _set_cache_env(env)
    return env
