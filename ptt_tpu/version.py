"""Version string, suffixed with the git SHA when available (reference
setup.py:8-14 / ptt/version.py pattern)."""

import subprocess
from pathlib import Path

BASE_VERSION = "0.1.0"


def _git_sha() -> str:
    try:
        out = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=Path(__file__).resolve().parent,
            capture_output=True, text=True, timeout=5,
        )
        return out.stdout.strip() if out.returncode == 0 else ""
    except Exception:
        return ""


_sha = _git_sha()
__version__ = f"{BASE_VERSION}+{_sha}" if _sha else BASE_VERSION
