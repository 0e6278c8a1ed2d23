"""Early pytest plugin: re-exec the test process with an unlimited stack.

The XLA CPU compiler recurses deeply on this package's larger programs
(the full detector pipeline with the depth-peeled inner pass); with the
default 8 MB stack rlimit it segfaults late in a long single-process
suite run — mmap regions placed 8 MB below the stack at exec time block
stack growth, so raising the rlimit mid-process is not enough, and each
crashing program compiles fine in a fresh process.  (Verified
deterministic: three suite runs in a row died at the same detect()
compile in tests/test_parity.py without this.)

This must run BEFORE pytest's capture plugin swaps fds 1/2 for temp
files (an execv after that point leaves the new process writing to the
old process's deleted capture file), hence an `addopts = -p` plugin
(loaded during command-line pre-parsing) rather than conftest.py logic.
Loaded via pyproject.toml [tool.pytest.ini_options] addopts; run pytest
from the repo root (`python -m pytest tests/`) so the module resolves.
"""

import os
import resource
import sys

_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
if _soft != resource.RLIM_INFINITY and not os.environ.get(
    "_ARUCO3_STACK_REEXEC"
):
    try:
        resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))
        os.environ["_ARUCO3_STACK_REEXEC"] = "1"
        # sys.argv[0] is pytest's __main__.py (or the pytest script);
        # exec'ing it directly loses `python -m`'s cwd sys.path entry, so
        # carry the import path over explicitly.
        pp = os.environ.get("PYTHONPATH", "")
        os.environ["PYTHONPATH"] = (
            os.getcwd() + (os.pathsep + pp if pp else "")
        )
        os.execv(sys.executable, [sys.executable] + sys.argv)
    except (ValueError, OSError):
        pass  # keep the default stack; most runs still pass
