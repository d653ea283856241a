"""Repo hygiene: keep git-tracked artifacts pushable.

GitHub rejects files over its 100 MB hard limit, so any tracked blob above
that (e.g. a large repo-shipped XLA compile-cache entry under .jax_cache/)
would make the remote implied by .github/workflows unpushable. The shipped
cache is intentional (it keeps driver bench/dryrun compiles warm), but every
entry must stay under the limit — oversized ones belong in /tmp caches only.
"""

import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIMIT = 95 * 1024 * 1024  # 95 MB: safety margin under GitHub's 100 MB hard cap


def test_no_tracked_file_exceeds_github_limit():
    files = subprocess.run(
        ["git", "ls-files"], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout.splitlines()
    assert files, "git ls-files returned nothing — not a git checkout?"
    oversized = []
    for rel in files:
        path = os.path.join(REPO, rel)
        try:
            size = os.path.getsize(path)
        except OSError:
            continue  # deleted-but-staged entries
        if size > LIMIT:
            oversized.append((rel, size))
    assert not oversized, (
        "git-tracked files exceed the 95 MB pushability cap (GitHub hard-fails "
        f"at 100 MB): {[(r, f'{s / 1e6:.0f}MB') for r, s in oversized]}. "
        "Ship large compile-cache entries via /tmp, not the repo."
    )
