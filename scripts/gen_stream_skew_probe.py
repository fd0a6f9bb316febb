"""Build a CAPPED skewed-sf5 probe tier for the stream-stream interval
joins (VERDICT r8 item 4).

The full sf5skew tier excludes that family by design: the hot user's
pair count is quadratic in its event count (~900M pairs at 4M hot
events), so the EXACT oracle is infeasible. This probe keeps the skew
shape but bounds the hot key's density: the hot user's events are
subsampled to a deterministic 2% slice (event_id % 50 == 0) while every
other user keeps full density. The filter is applied to the PHYSICAL
events file once, so engine and oracle read identical rows by
construction and the result stays exact/data-determined:

  hot pairs ~ (0.02)^2 x 900M ~ 360k  (linear-regime, oracle-feasible)
  hot user still carries ~12x the events of a typical user, so the
  skewed-join code path (hour-bucket equality key, exploded probe side)
  is exercised, one rung above the sf1skew validation where constants
  hide.

Usage:
  python scripts/gen_stream_skew_probe.py            # writes .stress/sf5skewcap
  DRIVER_SIM_DRIVER_MEM=32g DRIVER_SIM_SF_DIR=.stress/sf5skewcap \
      python scripts/driver_sim.py q_stream_stream_join q_stream_outer_join
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow.parquet as pq

SRC = os.environ.get("PROBE_SRC", ".stress/sf5skew")
OUT = os.environ.get("PROBE_OUT", ".stress/sf5skewcap")
TABLES = (
    "region nation customer supplier part orders lineitem documents embeddings"
).split()
HOT_KEEP_MOD = 50  # keep hot-user events where event_id % 50 == 0 (2%)


def main() -> int:
    if not os.path.isdir(SRC):
        print(f"source tier {SRC} missing — run scripts/gen_scale.py first")
        return 1
    # Rebuild from scratch: a stale half-built OUT (prior crash, older
    # SRC vintage) must not silently keep old files (ADVICE r9).
    if os.path.isdir(OUT):
        shutil.rmtree(OUT)
    os.makedirs(OUT)
    # Non-events tables are byte-identical: link, copy only when OUT sits
    # on a different filesystem (os.link raises EXDEV there — ADVICE r9).
    for t in TABLES:
        dst = f"{OUT}/{t}.parquet"
        try:
            os.link(f"{SRC}/{t}.parquet", dst)
        except OSError:
            shutil.copy(f"{SRC}/{t}.parquet", dst)
    ev = pq.ParquetFile(f"{SRC}/events.parquet").read()
    uid = ev.column("user_id").to_numpy()
    eid = ev.column("event_id").to_numpy()
    counts = np.bincount(uid - uid.min())
    hot = int(counts.argmax()) + int(uid.min())
    keep = (uid != hot) | (eid % HOT_KEEP_MOD == 0)
    capped = ev.filter(np.asarray(keep))
    pq.write_table(capped, f"{OUT}/events.parquet")
    n_hot = int(((uid == hot) & keep).sum())
    print(
        f"capped tier at {OUT}: events {ev.num_rows} -> {capped.num_rows} "
        f"(hot user {hot}: {int((uid == hot).sum())} -> {n_hot})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
