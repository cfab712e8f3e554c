#!/bin/bash
# Draw-lottery sweep (round-19 verdict task 4): run the round-18
# restated gates against N regenerated corpus draws (tools/draw_gen.scala)
# and report the observed failure rate vs the claimed percent-level band.
#
# Usage: tools/draw_sweep.sh [nDraws]   (default 20; draws must already
# exist under /tmp/graft_draws — run draw_gen.scala first)
set -u
N=${1:-20}
GATES="ann_mode_agreement,dedup_mode_agreement,dedup_minhash_pairs_fast,sim_recall_ivf,sim_recall_ivf_loaded,sim_recall_ivf_deleted,sim_recall_ivf_upsert,sim_recall_pq,sim_recall_pq_loaded,sim_recall_pq_deleted,sim_recall_pq_upsert,sim_recall_pq_rerank,sim_recall_telemetry"
OUT=/tmp/graft_draw_sweep
mkdir -p "$OUT"
pass=0; fail=0
for n in $(seq 1 "$N"); do
  i=$(printf "%02d" "$n")
  d="/tmp/graft_draws/draw$i"
  # flatten spark's directory-per-table output to the single-file shape
  # the driver's testdata (and oracle_check's read_parquet) expects
  for t in documents embeddings; do
    if [ -d "$d/$t.parquet" ]; then
      parts=("$d/$t.parquet"/part-*.parquet)
      if [ ${#parts[@]} -eq 1 ]; then
        mv "${parts[0]}" "$d/.$t.flat.parquet"
      else
        python3 - "$d/$t.parquet" "$d/.$t.flat.parquet" <<'EOF'
import sys, glob
import pyarrow.parquet as pq, pyarrow as pa
tables = [pq.read_table(f) for f in sorted(glob.glob(f"{sys.argv[1]}/part-*.parquet"))]
pq.write_table(pa.concat_tables(tables), sys.argv[2])
EOF
      fi
      rm -rf "$d/$t.parquet"
      mv "$d/.$t.flat.parquet" "$d/$t.parquet"
    fi
  done
  vo="$OUT/draw$i"
  rm -rf "$vo"
  SPARK_GRAFT_ONLY="$GATES" sbt -batch "runMain graft.Verify $d $vo" \
    > "$OUT/verify_$i.log" 2>&1
  python3 tools/oracle_check.py "$d" "$vo" > "$OUT/oracle_$i.log" 2>&1
  rc=$?
  head -1 "$OUT/oracle_$i.log" | sed "s/^/draw$i: /"
  if [ $rc -eq 0 ]; then pass=$((pass+1)); else fail=$((fail+1));
    grep "FAIL " "$OUT/oracle_$i.log" | sed "s/^/draw$i: /"; fi
  # surface the raw recall distribution for the PERF.md table
  python3 - "$vo" "$i" <<'EOF'
import sys, glob
import pyarrow.parquet as pq
fs = glob.glob(f"{sys.argv[1]}/sim_recall_telemetry/*.parquet")
if fs:
    t = pq.read_table(fs[0]).to_pandas()
    for _, r in t.iterrows():
        print(f"draw{sys.argv[2]}: telemetry {r['family']} floor={r['floor']} "
              f"min={r['min_recall']:.3f} mean={r['mean_recall']:.3f} "
              f"all_sane={r['all_sane']} mean_ok={r['mean_ok']}")
EOF
done
echo "SWEEP: $pass/$N draws fully green, $fail with >=1 gate failure"
