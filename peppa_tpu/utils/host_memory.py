"""Host-memory watchdog: survive the axon tunnel's per-transfer leak.

The axon PJRT tunnel plugin (JAX_PLATFORMS=axon) retains a host-heap copy of
every host->device transfer for the lifetime of the session: a training loop
leaks exactly one batch of host RAM per step (measured ~2.4 MB/step at the
soak shapes; a 2 h run was OOM-killed at 119 GB anon RSS — see PERF.md
"Host-memory leak").  jax.live_arrays() stays constant and malloc_trim
recovers nothing, so the retention is inside the plugin, below JAX.

The plugin's exported `axon_reset()` drops the whole terminal-side session —
reclaiming the heap — and invalidates every live device buffer (watermark
check), while letting already-traced executables rebind transparently on
their next call.  Both properties are load-bearing and verified on hardware:
a mid-run recycle (device_get state -> axon_reset -> device_put state) is
BIT-EXACT vs an uninterrupted run, with no recompiles.

`SessionRecycler` packages that sequence; the Trainer triggers it between
steps when host RSS crosses `tpu.host_rss_recycle_gb`.  On platforms without
the plugin (CPU tests, real TPU hosts) the recycler reports unavailable and
the watchdog only warns.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Optional

_AXON_PLUGIN_PATHS = ("/opt/axon/libaxon_pjrt.so",)


def host_mem_total_bytes() -> int:
    """Physical RAM of this host (procfs MemTotal; 1 TiB if unreadable)."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal"):
                    return int(line.split()[1]) * 1024
    except OSError:  # pragma: no cover - non-procfs platforms
        pass
    return 1 << 40


def host_rss_bytes() -> int:
    """Resident set size of this process, in bytes (0 if unreadable)."""
    try:
        with open(f"/proc/{os.getpid()}/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) * 1024
    except OSError:  # pragma: no cover - non-procfs platforms
        pass
    return 0


class SessionRecycler:
    """Recycle the axon device session to reclaim leaked host memory.

    recycle(tree) round-trips a pytree of live jax.Arrays through the host
    around an `axon_reset()`, preserving shardings.  Every OTHER device
    buffer dies with the session — callers must pass everything they intend
    to keep (training state, RNG keys) and re-transfer anything else
    (prefetched batches: Prefetcher.bump_generation()).
    """

    def __init__(self) -> None:
        self._lib = None
        path = self._loaded_plugin_path()
        if path is not None and not self._backend_is_cpu():
            import ctypes

            try:
                lib = ctypes.CDLL(path)  # already loaded: same handle
                lib.axon_reset.restype = ctypes.c_int64
                self._lib = lib
            except (OSError, AttributeError):  # pragma: no cover
                logging.warning("axon plugin at %s lacks axon_reset", path)

    @staticmethod
    def _backend_is_cpu() -> bool:
        """Plugin discovery maps the .so even in CPU-forced test processes;
        a reset only applies when the tunneled device backend is live."""
        import jax

        try:
            return jax.default_backend() == "cpu"
        except Exception:  # pragma: no cover - backend init failure
            return True

    @staticmethod
    def _loaded_plugin_path() -> Optional[str]:
        """The axon plugin path IF it is mapped into this process.

        `jax.default_backend()` canonicalizes axon to "tpu", so the reliable
        signal that resets apply to the live backend is the plugin .so being
        loaded (it only loads when it IS the PJRT backend).
        """
        try:
            with open("/proc/self/maps") as f:
                maps = f.read()
        except OSError:  # pragma: no cover - non-procfs platforms
            return None
        for path in _AXON_PLUGIN_PATHS:
            if path in maps:
                return path
        for line in maps.splitlines():  # non-standard install locations
            if "libaxon_pjrt.so" in line:
                return line.split()[-1]
        return None

    @property
    def available(self) -> bool:
        return self._lib is not None

    def recycle(self, tree: Any) -> Any:
        """Host-round-trip `tree` around a session reset; returns the new
        (live) tree.  Blocks until all in-flight computation producing
        `tree` has finished (device_get is the barrier)."""
        import jax

        # flatten rather than tree.map a parallel "shardings tree": a None
        # sharding leaf (numpy/python leaves have no .sharding) would be
        # treated as an empty SUBTREE by a paired tree.map and raise a
        # structure mismatch
        leaves, treedef = jax.tree.flatten(tree)
        shardings = [getattr(a, "sharding", None) for a in leaves]
        host = jax.device_get(leaves)
        rc = int(self._lib.axon_reset())
        if rc != 0:  # pragma: no cover - plugin contract violation
            raise RuntimeError(f"axon_reset failed rc={rc}")
        # the reset FREES the plugin's retained transfer copies, but after
        # tens of GB glibc keeps the freed chunks on the heap instead of
        # returning them (observed: 80 GB RSS barely moved post-reset at
        # step 65k of the soak, while a fresh-heap probe dropped fully);
        # malloc_trim madvises free pages back to the OS so RSS reflects
        # reality and the watchdog's thresholds stay meaningful
        try:
            import ctypes

            ctypes.CDLL("libc.so.6").malloc_trim(0)
        except OSError:  # pragma: no cover - non-glibc platforms
            pass
        def put(h, s):
            if s is None:
                return jax.device_put(h)
            try:
                return jax.device_put(h, s)
            except Exception:  # pragma: no cover - sharding died with reset
                # per-leaf, logged fallback: never silently drop EVERY
                # sharding (and never mask a genuine post-reset device_put
                # failure for the unsharded leaves)
                logging.warning(
                    "recycle: sharding %s no longer valid after session "
                    "reset; leaf re-uploaded to the default device", s)
                return jax.device_put(h)

        return jax.tree.unflatten(treedef,
                                  [put(h, s) for h, s in zip(host, shardings)])


class HostMemoryWatchdog:
    """Trigger a session recycle when host RSS crosses a threshold.

    check() is cheap (one procfs read) and safe to call every step; it
    returns True when the caller should recycle now.  Without a recycler
    (non-axon platforms) it logs one warning at the threshold and goes
    quiet — growth there is a real leak to investigate, not tunnel noise.
    """

    def __init__(self, limit_gb: Optional[float],
                 recycler: Optional[SessionRecycler] = None) -> None:
        self.limit_bytes = int(limit_gb * (1 << 30)) if limit_gb else None
        self.recycler = recycler if recycler is not None else (
            SessionRecycler() if self.limit_bytes else None)
        self._warned = False

    def check(self) -> bool:
        if not self.limit_bytes:
            return False
        if host_rss_bytes() < self.limit_bytes:
            return False
        if self.recycler is not None and self.recycler.available:
            return True
        if not self._warned:  # pragma: no cover - log-only branch
            logging.warning(
                "host RSS above %.1f GB but no session recycler is available "
                "on this platform; if growth continues the OS may OOM-kill "
                "the run (checkpoints + --auto_resume will recover it)",
                self.limit_bytes / (1 << 30))
            self._warned = True
        return False

    def note_recycled(self) -> None:
        """Adaptive hysteresis: call after each recycle.

        The state re-upload itself goes through the leaky transfer path, so
        the post-recycle floor is roughly (process base + one state).  A
        limit below that floor would re-trigger every step — each recycle
        costs a full state round trip over the tunnel, so thrashing turns
        training into permanent transfer.  If RSS is still near the limit
        after recycling, raise the effective limit above the observed floor.
        """
        post = host_rss_bytes()
        if post >= 0.7 * self.limit_bytes:
            # never ratchet past physical RAM: a limit the process cannot
            # reach without being OOM-killed is no limit at all (the first
            # soak died at ~93% of MemTotal)
            ceiling = int(0.8 * host_mem_total_bytes())
            new_limit = min(max(self.limit_bytes, int(post * 1.5)), ceiling)
            if new_limit > self.limit_bytes:
                logging.warning(
                    "post-recycle host RSS %.1f GB is near the %.1f GB "
                    "limit (the session floor includes one retained state "
                    "upload); raising the recycle threshold to %.1f GB to "
                    "avoid thrashing",
                    post / (1 << 30), self.limit_bytes / (1 << 30),
                    new_limit / (1 << 30))
                self.limit_bytes = new_limit
            elif post >= ceiling:  # pragma: no cover - log-only branch
                logging.error(
                    "post-recycle host RSS %.1f GB is at the physical-RAM "
                    "ceiling (%.1f GB); recycles are not reclaiming — "
                    "expect heavy recycle churn or an OOM kill (checkpoints "
                    "+ --auto_resume will recover the run)",
                    post / (1 << 30), ceiling / (1 << 30))
