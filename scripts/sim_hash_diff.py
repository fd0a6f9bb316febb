"""Round-over-round hash drift report (VERDICT r9 item 4).

The driver's correctness sample has been frozen at the same 50 keys
since r8, so silent semantic drift in the other ~300 keys would only
surface through the full sim. This makes the comparison mechanical:
parse two full-sim logs (docs/validation/sim_full_r{N}.log format) and
report every key whose value hash or row count changed, plus keys added
or removed. A changed hash is not automatically a bug — an intentional
semantics/exactness change moves it — but every change must be
annotated in the committed diff (docs/validation/sim_hash_diff_r{N}.txt).

    python scripts/sim_hash_diff.py OLD_LOG NEW_LOG
"""

from __future__ import annotations

import re
import sys

_LINE = re.compile(
    r"^\[(OK|FAIL|rows-only)\]\s+(\S+): (\d+) rows(?:, hash=([0-9a-f]+))?"
)


def parse(path: str) -> dict[str, tuple[str, str, str]]:
    out: dict[str, tuple[str, str, str]] = {}
    with open(path) as f:
        for line in f:
            m = _LINE.match(line.strip())
            if m:
                status, key, rows, h = m.groups()
                out[key.rstrip(":")] = (status, rows, h or "")
    return out


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    old, new = parse(sys.argv[1]), parse(sys.argv[2])
    changed = []
    for key in sorted(set(old) & set(new)):
        if old[key] != new[key]:
            changed.append(
                f"{key}: rows {old[key][1]} -> {new[key][1]}, "
                f"hash {old[key][2]} -> {new[key][2]}"
            )
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    print(f"compared {len(old)} old vs {len(new)} new keys")
    print(f"changed: {len(changed)}, added: {len(added)}, removed: {len(removed)}")
    for line in changed:
        print(f"  CHANGED {line}")
    for k in added:
        print(f"  ADDED   {k}")
    for k in removed:
        print(f"  REMOVED {k}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
