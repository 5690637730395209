"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths can be exercised without TPU hardware
(SURVEY.md §4 — the reference has no fake-backend distributed tests; we
close that gap here).

The environment pre-sets JAX_PLATFORMS=axon and its sitecustomize pins the
platform, so the env var alone is not enough — `jax.config.update` after
import is authoritative."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Same-machine persistent compilation cache for the suite's subprocess
# tests (train_server/selfplay_client spawns recompile identical graphs
# otherwise); inherited through their environment.  Safe here because
# compile + load happen on one host — the cross-machine SIGILL concern
# that keeps this default-off is about remote compile services
# (elf_tpu/cache.py).
os.environ.setdefault("ELF_TPU_CPU_CACHE", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# the in-process test session benefits too (entry-script subprocesses
# call enable_compilation_cache themselves)
from elf_tpu.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


# ---------------------------------------------------------------------------
# In-tree `timeout` marker (VERDICT r3 weak #2): pytest-timeout is not in the
# image, so implement the marker with faulthandler's C-level watchdog thread.
# On expiry it dumps every thread's traceback to stderr and hard-exits the
# process — a hang anywhere (including inside an XLA compile, where Python
# signal handlers would not run) becomes a diagnosable failure instead of a
# stalled suite.

import faulthandler  # noqa: E402

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "timeout(seconds): hard watchdog — dump all stacks and exit if the "
        "test runs longer than `seconds`",
    )


# pytest's fd-level capture would swallow the dump when the watchdog
# hard-exits, so write it to a stable path instead.
WATCHDOG_LOG = "/tmp/elf_tpu_watchdog.log"
_watchdog_file = None


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_protocol(item, nextitem):
    global _watchdog_file
    marker = item.get_closest_marker("timeout")
    if marker is not None:
        if _watchdog_file is None:
            _watchdog_file = open(WATCHDOG_LOG, "w")
        _watchdog_file.seek(0)
        _watchdog_file.truncate()
        _watchdog_file.write(
            f"watchdog armed for {item.nodeid} ({marker.args[0]}s); a stack "
            "dump below means the test hung and the suite was hard-exited\n"
        )
        _watchdog_file.flush()
        faulthandler.dump_traceback_later(
            float(marker.args[0]), exit=True, file=_watchdog_file
        )
    try:
        yield
    finally:
        if marker is not None:
            faulthandler.cancel_dump_traceback_later()
