"""Merge user-cache autotune entries into the packaged tuned table.

The autotuners (kernels/autotune.tune_* via benchmarks/tune_conv.py etc.)
persist winners to ~/.cache/stabletriton_tpu/<platform>.json; this copies
them into the repo's packaged table (kernels/tuned/<platform>.json) so fresh
checkouts get the tuned dispatch without re-running the sweep on hardware.

Usage: python scripts/merge_tuned.py [platform]   (default tpu_v5_lite)
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from stabletriton_tpu.kernels import autotune


def main(platform: str = "tpu_v5_lite") -> None:
    user = autotune._user_cache_path(platform)
    packaged = autotune._PACKAGED_DIR / f"{platform}.json"
    if not user.exists():
        raise SystemExit(f"no user cache at {user}")
    new = json.loads(user.read_text())
    table = json.loads(packaged.read_text()) if packaged.exists() else {}
    added = changed = 0
    for k, v in sorted(new.items()):
        if k not in table:
            added += 1
        elif table[k] != v:
            changed += 1
        table[k] = v
    packaged.write_text(json.dumps(table, indent=1, sort_keys=True) + "\n")
    print(f"{packaged}: {len(table)} entries ({added} added, {changed} updated "
          f"from {user})")


if __name__ == "__main__":
    main(*sys.argv[1:])
