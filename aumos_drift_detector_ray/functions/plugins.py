"""Custom drift-test UDF registry with isolated execution.

The reference runs user plugins in a subprocess with a 30 s timeout and
JSON-marshalled data (adapters/plugin_sandbox.py:41-126, contract:
``drift_test(reference_data, production_data) -> dict`` with at least
``drift_detected``). The Ray-native analogue keeps the exact contract
but executes the plugin in a **Ray task** — already a separate worker
process — with the same timeout and the same error envelope
``{"error": ..., "drift_detected": False}``. Registered callables can
also be applied inside the drift stage to merged window samples.
"""

from __future__ import annotations

from typing import Any, Callable

import ray

DEFAULT_TIMEOUT_SECONDS = 30  # plugin_sandbox.py:23
DEFAULT_MEMORY_LIMIT_MB = 512  # plugin_sandbox.py:56-65

# Extra driver-side grace on top of the in-worker deadline: covers Ray
# scheduling/worker-startup delay, which the reference's subprocess
# timeout (measured from exec start) never charges to the plugin.
_SCHEDULING_GRACE_SECONDS = 60


class _PluginTimeout(Exception):
    pass


class _deadline:
    """In-worker execution deadline via SIGALRM (Ray tasks run on the
    worker's main thread). Mirrors the reference sandbox, which times
    the plugin's *execution*, not its queueing: a task that waits in
    the scheduler for 29 s still gets its full 30 s budget. No-op off
    the main thread or where signals are unavailable."""

    def __init__(self, seconds: float) -> None:
        self.seconds = seconds
        self._armed = False

    def __enter__(self) -> "_deadline":
        import signal
        import threading

        if threading.current_thread() is not threading.main_thread():
            return self
        try:
            def _raise(signum: int, frame: Any) -> None:
                raise _PluginTimeout()

            self._old = signal.signal(signal.SIGALRM, _raise)
            signal.setitimer(signal.ITIMER_REAL, self.seconds)
            self._armed = True
        except (ValueError, OSError):
            pass
        return self

    def __exit__(self, *exc: Any) -> None:
        if self._armed:
            import signal

            signal.setitimer(signal.ITIMER_REAL, 0)
            signal.signal(signal.SIGALRM, self._old)


def _call_with_memory_cap(fn: Callable[[], Any], limit_mb: int) -> Any:
    """Run ``fn`` under an rlimit heap cap of current-usage + limit_mb
    (the reference sandbox's 512 MB declaration). RLIMIT_DATA rather
    than RLIMIT_AS: Ray workers map the plasma store into their address
    space, so an absolute AS cap would trip on pre-existing mappings.
    The soft limit is restored afterwards — Ray reuses worker processes
    and a leftover cap would poison later tasks. A blown cap raises
    MemoryError, which the caller turns into the error envelope."""
    try:
        import resource

        soft, hard = resource.getrlimit(resource.RLIMIT_DATA)
        vmdata_kb = 0
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmData:"):
                    vmdata_kb = int(line.split()[1])
                    break
        cap = vmdata_kb * 1024 + limit_mb * 2**20
        if hard != resource.RLIM_INFINITY:
            cap = min(cap, hard)
        resource.setrlimit(resource.RLIMIT_DATA, (cap, hard))
    except (ImportError, OSError, ValueError):  # non-Linux / restricted
        return fn()
    try:
        return fn()
    finally:
        resource.setrlimit(resource.RLIMIT_DATA, (soft, hard))

_REGISTRY: dict[str, Callable[[list[float], list[float]], dict[str, Any]]] = {}


def register_drift_test(
    name: str, fn: Callable[[list[float], list[float]], dict[str, Any]]
) -> None:
    """Register a ``drift_test(ref, prod) -> dict`` callable under a name."""
    _REGISTRY[name] = fn


def registered_tests() -> dict[str, Callable]:
    return dict(_REGISTRY)


def run_plugin(
    plugin: str | Callable[[list[float], list[float]], dict[str, Any]],
    reference_data: list[float],
    production_data: list[float],
    timeout_seconds: int = DEFAULT_TIMEOUT_SECONDS,
    memory_limit_mb: int = DEFAULT_MEMORY_LIMIT_MB,
) -> dict[str, Any]:
    """Execute a plugin (registered name, callable, or Python source
    string defining ``drift_test``) in an isolated Ray worker with a
    timeout and a heap cap (reference: 30 s / 512 MB,
    plugin_sandbox.py:23,56-65). Errors, timeouts and blown memory caps
    return the reference's error envelope instead of raising
    (plugin_sandbox.py:96-126)."""
    if isinstance(plugin, str) and plugin in _REGISTRY:
        fn = _REGISTRY[plugin]
        code = None
    elif isinstance(plugin, str):
        fn = None
        code = plugin
    else:
        fn = plugin
        code = None

    @ray.remote(max_retries=0)
    def _exec(ref: list[float], prod: list[float]) -> dict[str, Any]:
        def call() -> Any:
            if code is not None:
                ns: dict[str, Any] = {}
                exec(code, ns)  # user-supplied source, isolated in this worker
                return ns["drift_test"](ref, prod)
            return fn(ref, prod)

        try:
            with _deadline(timeout_seconds):
                result = _call_with_memory_cap(call, memory_limit_mb)
            if not isinstance(result, dict):
                raise TypeError("drift_test must return a dict")
            return result
        except _PluginTimeout:
            return {"error": f"plugin timed out after {timeout_seconds}s",
                    "drift_detected": False}
        except MemoryError:
            return {"error": f"plugin exceeded the {memory_limit_mb} MB "
                             "memory limit", "drift_detected": False}
        except Exception as exc:  # error envelope, run continues
            return {"error": str(exc), "drift_detected": False}

    ref_obj = _exec.remote(list(reference_data), list(production_data))
    # Backstop only (plugin blocked in C code that SIGALRM can't
    # interrupt, or a wedged worker): the real budget is the in-worker
    # deadline above.
    done, _ = ray.wait([ref_obj],
                       timeout=timeout_seconds + _SCHEDULING_GRACE_SECONDS)
    if not done:
        ray.cancel(ref_obj, force=True)
        return {"error": f"plugin timed out after {timeout_seconds}s",
                "drift_detected": False}
    try:
        return ray.get(done[0])
    except Exception as exc:
        return {"error": str(exc), "drift_detected": False}
