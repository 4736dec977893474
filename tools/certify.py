"""Round-close certification gate (r10, VERDICT item 1).

The r9 round closed with a red test suite because the final feature
commit postdated the certification run — the COVERAGE block claimed a
pytest result for a tree that no longer existed.  This tool makes that
class of staleness mechanically impossible:

1. Refuses to even START unless the working tree is clean, so the
   results can only ever describe a committed state.
2. Records the HEAD SHA before running, runs the full gate
   (pytest tests/ + the sf0.01 and sf0.1 oracle sweeps), then
   re-checks that HEAD and the tree are STILL the same — a commit or
   edit that landed mid-run voids the certification.
3. Only on an all-green, same-SHA run does it rewrite COVERAGE.md's
   round-close certification block, stamping the SHA it certifies.
   The block's claim is therefore always attributable to one exact
   commit; a later feature commit visibly postdates it.

Usage:
    python tools/certify.py [--skip-sf01] [--skip-sf1] [--pytest-args ...]

Exit 0 = certified + COVERAGE.md updated; nonzero = not certified
(reason on stderr), COVERAGE.md untouched.
"""

from __future__ import annotations

import argparse
import datetime
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
COVERAGE = os.path.join(REPO, "COVERAGE.md")
BLOCK_START = "<!-- certification:start -->"
BLOCK_END = "<!-- certification:end -->"


def _run(cmd: list[str], **kw) -> subprocess.CompletedProcess:
    return subprocess.run(cmd, cwd=REPO, text=True, capture_output=True, **kw)


def git_state() -> tuple[str, bool]:
    sha = _run(["git", "rev-parse", "HEAD"]).stdout.strip()
    dirty = bool(_run(["git", "status", "--porcelain"]).stdout.strip())
    return sha, dirty


def run_pytest(extra: list[str]) -> tuple[bool, str]:
    t0 = time.time()
    p = subprocess.run(
        # -m "" overrides pytest.ini's fast-tier default (the last -m
        # wins): certification always runs the FULL suite, slow fuzz
        # machines and crash matrices included
        [sys.executable, "-m", "pytest", "tests/", "-q", "-m", "", *extra],
        cwd=REPO, text=True, capture_output=True,
    )
    tail = (p.stdout or "").strip().splitlines()
    summary = tail[-1] if tail else "(no output)"
    # the suite is green iff pytest exits 0 (skips allowed, failures not)
    ok = p.returncode == 0
    return ok, f"{summary} [{time.time() - t0:.0f}s]"


def run_sweep(sf_dir: str) -> tuple[bool, str]:
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, "tools/check.py", sf_dir],
        cwd=REPO, text=True, capture_output=True,
    )
    m = re.search(r"== (\d+) pass, (\d+) fail, (\d+) rows-only ==",
                  p.stdout or "")
    if not m:
        return False, f"sweep at {sf_dir} produced no summary (rc={p.returncode})"
    line = (f"{m.group(1)} pass / {m.group(2)} fail / {m.group(3)} rows-only "
            f"[{time.time() - t0:.0f}s]")
    return p.returncode == 0 and m.group(2) == "0", line


def write_block(sha: str, lines: list[str]) -> None:
    stamp = datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%d %H:%M UTC")
    body = "\n".join([
        BLOCK_START,
        "## Round-close certification",
        "",
        f"**Certified commit: `{sha}`** ({stamp}, `tools/certify.py` — "
        "refuses a dirty tree, re-checks the SHA after the runs, so this "
        "block can never describe an uncommitted or superseded state):",
        "",
        *[f"- {ln}" for ln in lines],
        BLOCK_END,
    ])
    with open(COVERAGE, encoding="utf-8") as f:
        text = f.read()
    if BLOCK_START in text:
        pre, rest = text.split(BLOCK_START, 1)
        _, post = rest.split(BLOCK_END, 1)
        text = pre + body + post
    else:
        text = text.rstrip() + "\n\n" + body + "\n"
    with open(COVERAGE, "w", encoding="utf-8") as f:
        f.write(text)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-sf01", action="store_true")
    ap.add_argument("--skip-sf1", action="store_true")
    ap.add_argument("pytest_args", nargs="*")
    args = ap.parse_args()

    sha0, dirty = git_state()
    if dirty:
        print("NOT CERTIFIED: working tree is dirty — commit first; "
              "certification must describe an exact commit", file=sys.stderr)
        return 2

    results: list[str] = []
    ok_all = True

    ok, line = run_pytest(args.pytest_args)
    results.append(f"full pytest: {line}")
    ok_all &= ok
    print(f"[certify] pytest: {'OK' if ok else 'FAIL'} — {line}")

    for flag, sf in ((args.skip_sf01, "/root/testdata/sf0.01"),
                     (args.skip_sf1, "/root/testdata/sf0.1")):
        if flag:
            continue
        ok, line = run_sweep(sf)
        results.append(f"oracle sweep {os.path.basename(sf)}: {line}")
        ok_all &= ok
        print(f"[certify] sweep {sf}: {'OK' if ok else 'FAIL'} — {line}")

    sha1, dirty1 = git_state()
    if sha1 != sha0 or dirty1:
        print(f"NOT CERTIFIED: tree moved mid-run (HEAD {sha0[:9]} -> "
              f"{sha1[:9]}, dirty={dirty1}) — results describe a stale "
              "state; re-run at the final commit", file=sys.stderr)
        return 3
    if not ok_all:
        print("NOT CERTIFIED: a gate failed — COVERAGE.md untouched",
              file=sys.stderr)
        return 1

    write_block(sha0, results)
    print(f"[certify] CERTIFIED {sha0[:9]} — COVERAGE.md block updated "
          "(commit the block; it names the SHA it certifies)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
