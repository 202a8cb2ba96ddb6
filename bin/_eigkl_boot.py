"""Bootstrap for bin/eigkl: restore the package paths `-S` dropped.

Under ``python -S`` neither the venv's site-packages (numpy, jax) nor
sitecustomize runs.  We re-add site-packages and the repo root by hand
— but NOT the sitecustomize jax boot, which is the whole point — then
hand off to the CLI.  `cli.main` re-execs a full interpreter when the
platform router decides the run needs the TPU plugin.
"""

import os
import sys
import sysconfig

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_ver = f"python{sys.version_info[0]}.{sys.version_info[1]}"
# Under -S the venv (pyvenv.cfg) is not processed, so sysconfig points
# at the base interpreter's purelib; derive the venv's site-packages
# from the executable location as well and add whichever exist.
_venv = os.path.dirname(os.path.dirname(os.path.abspath(sys.executable)))
_candidates = [
    os.path.join(_venv, "lib", _ver, "site-packages"),
    sysconfig.get_path("purelib"),
    _repo,
]
for p in reversed(_candidates):
    if p and os.path.isdir(p) and p not in sys.path:
        sys.path.insert(0, p)

from eig_kl_tpu.cli.main import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
