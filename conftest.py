"""Root conftest: a ``--timeout`` fallback for images without pytest-timeout.

The per-test-timeout contract (reference pyproject.toml:57; our CI passes
``--timeout=300``) should hold wherever the suite runs. When the real
pytest-timeout plugin is installed (CI), this file does nothing. Otherwise it
registers a compatible ``--timeout`` option and enforces it with a SIGALRM
itimer around each test call — same mechanism as pytest-timeout's "signal"
method, with the same caveat (only interrupts Python bytecode on the main
thread, not a wedged C++ call).
"""

import signal

import pytest

try:
    import pytest_timeout  # noqa: F401

    _HAVE_PLUGIN = True
except ImportError:
    _HAVE_PLUGIN = False


if not _HAVE_PLUGIN:

    def pytest_addoption(parser):
        parser.addoption(
            "--timeout", type=float, default=None,
            help="per-test timeout in seconds (conftest SIGALRM fallback; "
                 "install pytest-timeout for the full plugin)")

    def pytest_configure(config):
        config.addinivalue_line(
            "markers",
            "timeout(seconds): per-test timeout (conftest fallback)")

    @pytest.hookimpl(wrapper=True)
    def pytest_runtest_call(item):
        limit = item.config.getoption("--timeout")
        marker = item.get_closest_marker("timeout")
        if marker and marker.args:
            limit = float(marker.args[0])
        if not limit or limit <= 0 or not hasattr(signal, "SIGALRM"):
            return (yield)

        def on_alarm(signum, frame):
            raise TimeoutError(
                f"{item.nodeid} timed out after {limit}s "
                f"(conftest --timeout fallback)")

        old = signal.signal(signal.SIGALRM, on_alarm)
        signal.setitimer(signal.ITIMER_REAL, limit)
        try:
            return (yield)
        finally:
            signal.setitimer(signal.ITIMER_REAL, 0)
            signal.signal(signal.SIGALRM, old)
