#!/usr/bin/env bash
# Interleaved same-box A/B bench: HEAD vs a given git ref.
#
# The box's bench times drift with co-tenant load and memory-bandwidth/
# frequency swing — r16 measured UNTOUCHED queries inflating ~20%
# uniformly across same-code runs hours apart. The decisive instrument
# for adjudicating "box or code" is this interleaved A/B: build the ref
# and HEAD in separate /tmp clones, run the chosen query subset
# alternating ref/HEAD/ref/HEAD on the same box back-to-back, take
# per-query minima across rounds, and emit a JSON ratio artifact.
# Parity (ratios ~1.0, both sides reproducing the drift vs the old
# committed artifact) means the box moved; a per-query ratio well off
# 1.0 under interleaving is a real code delta — bisect it.
#
# Usage: tools/bench_ab.sh <ref> [queries] [rounds] [sfdir]
#   ref      git ref to compare HEAD against (e.g. last round's commit)
#   queries  comma-separated SPARK_GRAFT_ONLY subset; default = the 5
#            most expensive queries in the repo's bench_out.json
#   rounds   A/B pairs to run (default 3; min-of-rounds is reported)
#   sfdir    testdata dir (default /root/testdata/sf0.1)
#
# Output: ab_out/ab_ratio.json — per-query wall-min and cpu-min for
# both sides plus head/ref ratios and min-sum summaries. CPU is the
# primary ruler (time-slice-immune); wall is the cross-check.
set -euo pipefail

REF="${1:?usage: bench_ab.sh <ref> [queries] [rounds] [sfdir]}"
QUERIES="${2:-}"
ROUNDS="${3:-3}"
SFDIR="${4:-/root/testdata/sf0.1}"
CPUS="${SPARK_GRAFT_CPUS:-32}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$REPO/ab_out"
mkdir -p "$OUT"

REFSHA="$(git -C "$REPO" rev-parse --short "$REF")"
HEADSHA="$(git -C "$REPO" rev-parse --short HEAD)"
if ! git -C "$REPO" diff --quiet HEAD -- ':!bench_out.json' 2>/dev/null; then
  echo "WARNING: working tree differs from HEAD — this benches commit" \
    "$HEADSHA, not your uncommitted changes" >&2
fi
CLONE_A="/tmp/graft_ab_${REFSHA}"
CLONE_B="/tmp/graft_ab_head_${HEADSHA}"

# Both sides run from /tmp clones so the interleave compares identical
# contexts (and never clobbers the repo's bench_out.json). HEAD must be
# committed — the clone sees commits, not the working tree.
clone_at() { # dir sha
  if [ ! -d "$1" ]; then
    git clone -q "$REPO" "$1"
    git -C "$1" checkout -q "$2"
  fi
}
clone_at "$CLONE_A" "$REFSHA"
clone_at "$CLONE_B" "$HEADSHA"

# sequential builds (never run two sbt invocations concurrently)
echo "building ref=$REFSHA and head=$HEADSHA ..." >&2
(cd "$CLONE_A" && sbt -batch compile >/dev/null)
(cd "$CLONE_B" && sbt -batch compile >/dev/null)

if [ -z "$QUERIES" ]; then
  QUERIES="$(jq -r '.queries_min | to_entries | sort_by(-.value)
    | .[0:5] | map(.key) | join(",")' "$REPO/bench_out.json")"
  echo "query subset (5 most expensive in bench_out.json): $QUERIES" >&2
fi

# Spark 4 on JDK 17 outside spark-submit needs the module opens
# (matches build.sbt's jdk17AddOpens)
JOPTS=()
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  JOPTS+=(--add-opens "java.base/$p=ALL-UNNAMED")
done
JOPTS+=(-Xmx"${SPARK_DRIVER_MEM:-8g}")

# Iterations per side-run. Default 3 = the committed bench's own
# min-of-3 methodology, so the ratio artifact compares the SAME
# quantity the committed bench_out.json records (r17 measurement fix:
# the original hard-coded 1 iteration made every sample a cold-JVM
# run — Janino compile + un-JIT-warmed generated code dominate task
# CPU there, which misreads any change that trades single-task JIT
# warmth for parallelism; AB_ITERS=1 remains available for a quick
# cold-path probe).
AB_ITERS="${AB_ITERS:-3}"

run_one() { # dir tag round
  (cd "$1" && SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_CPUS="$CPUS" \
    SPARK_GRAFT_ONLY="$QUERIES" SPARK_GRAFT_ITERS="$AB_ITERS" \
    java "${JOPTS[@]}" -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Bench >/dev/null 2>&1)
  cp "$1/bench_out.json" "$OUT/${2}_r${3}.json"
}

for r in $(seq 1 "$ROUNDS"); do
  echo "round $r/$ROUNDS: ref ..." >&2
  run_one "$CLONE_A" ref "$r"
  echo "round $r/$ROUNDS: head ..." >&2
  run_one "$CLONE_B" head "$r"
done

# per-query minima across rounds, per side, then head/ref ratios
minmap() { # field files...
  local field="$1"; shift
  jq -s "[.[].$field] | map(to_entries) | flatten | group_by(.key)
    | map({key: .[0].key, value: (map(.value) | min)}) | from_entries" "$@"
}
A_WALL="$(minmap queries_min "$OUT"/ref_r*.json)"
B_WALL="$(minmap queries_min "$OUT"/head_r*.json)"
A_CPU="$(minmap queries_cpu_min "$OUT"/ref_r*.json)"
B_CPU="$(minmap queries_cpu_min "$OUT"/head_r*.json)"

jq -n \
  --arg ref "$REFSHA" --arg head "$HEADSHA" --arg sf "$SFDIR" \
  --argjson rounds "$ROUNDS" --argjson cpus "$CPUS" \
  --argjson aw "$A_WALL" --argjson bw "$B_WALL" \
  --argjson ac "$A_CPU" --argjson bc "$B_CPU" '
  def rnd: (. * 10000 | round) / 10000;
  {
    ref: $ref, head: $head, rounds: $rounds, cpus: $cpus, sf: $sf,
    queries: ($aw | keys | map({
      (.): {
        ref_wall_min: ($aw[.] | rnd), head_wall_min: ($bw[.] | rnd),
        wall_ratio: (($bw[.] / $aw[.]) | rnd),
        ref_cpu_min: ($ac[.] | rnd), head_cpu_min: ($bc[.] | rnd),
        cpu_ratio: (($bc[.] / $ac[.]) | rnd)
      }}) | add),
    summary: {
      ref_wall_min_sum: ([$aw[]] | add | rnd),
      head_wall_min_sum: ([$bw[]] | add | rnd),
      wall_ratio: (([$bw[]] | add) / ([$aw[]] | add) | rnd),
      ref_cpu_min_sum: ([$ac[]] | add | rnd),
      head_cpu_min_sum: ([$bc[]] | add | rnd),
      cpu_ratio: (([$bc[]] | add) / ([$ac[]] | add) | rnd)
    },
    verdict: (
      (([$bc[]] | add) / ([$ac[]] | add)) as $r |
      if $r < 0.95 then "head faster on CPU — likely a real improvement"
      elif $r <= 1.05 then "parity on CPU — any cross-round drift is the box"
      else "head slower on CPU under interleaving — bisect before shipping"
      end)
  }' > "$OUT/ab_ratio.json"

cat "$OUT/ab_ratio.json"
