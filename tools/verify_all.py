"""One-command full verification: pytest + DuckDB oracle checks (tuned and
default-config sessions) + bench. Exit code 0 iff everything is green.

Usage: python tools/verify_all.py [--with-scaling]
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(name: str, cmd: list[str], env: dict | None = None) -> bool:
    print(f"== {name}: {' '.join(cmd)}", flush=True)
    e = dict(os.environ)
    if env:
        e.update(env)
    r = subprocess.run(cmd, cwd=REPO, env=e)
    print(f"== {name}: {'OK' if r.returncode == 0 else 'FAILED'}", flush=True)
    return r.returncode == 0


def main() -> None:
    ok = True
    ok &= run("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"])
    ok &= run("oracle (tuned)", [sys.executable, "tools/check_oracle.py", "/root/testdata/sf0.01"])
    ok &= run(
        "oracle (plain session)",
        [sys.executable, "tools/check_oracle.py", "/root/testdata/sf0.01"],
        env={"PLAIN_SESSION": "1"},
    )
    ok &= run("bench", [sys.executable, "bench.py"])
    if "--with-scaling" in sys.argv:
        ok &= run("scaling", [sys.executable, "tools/scaling_bench.py"])
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
