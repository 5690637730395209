#!/bin/bash
# Build the golden-fixture generator against the READ-ONLY reference board
# library and regenerate tests/golden/ fixtures.  Requires /root/reference.
set -euo pipefail
cd "$(dirname "$0")"

REF=/root/reference/src_cpp
SRC="$REF/elfgames/go/base/common.cc $REF/elfgames/go/base/board.cc \
     $REF/elfgames/go/base/go_state.cc $REF/elfgames/go/base/board_feature.cc"
FLAGS="-O2 -std=c++17 -w -I stub_include -I $REF"

mkdir -p build
g++ $FLAGS -o build/gen_golden_19 gen_golden.cc $SRC
g++ $FLAGS -DBOARD9x9 -o build/gen_golden_9 gen_golden.cc $SRC
g++ $FLAGS -DBOARD9x9 -o build/gen_mcts_golden_9 gen_mcts_golden.cc $SRC
g++ $FLAGS -o build/gen_mcts_golden_19 gen_mcts_golden.cc $SRC
g++ $FLAGS -o build/gen_sgf_golden_19 gen_sgf_golden.cc $REF/elfgames/go/sgf/sgf.cc \
    $REF/elfgames/go/base/common.cc $REF/elfgames/go/base/board.cc
g++ $FLAGS -o build/gen_ladder_golden_19 gen_ladder_golden.cc $SRC
g++ $FLAGS -DBOARD9x9 -o build/gen_ladder_golden_9 gen_ladder_golden.cc $SRC

OUT=../../tests/golden
mkdir -p "$OUT"
./build/gen_golden_19 6 220 | gzip -9 > "$OUT/ref_traj_19.jsonl.gz"
./build/gen_golden_9 8 170 | gzip -9 > "$OUT/ref_traj_9.jsonl.gz"
./build/gen_mcts_golden_9 | gzip -9 > "$OUT/ref_mcts_9.jsonl.gz"
./build/gen_mcts_golden_19 | gzip -9 > "$OUT/ref_mcts_19.jsonl.gz"
./build/gen_sgf_golden_19 | gzip -9 > "$OUT/ref_sgf_codec_19.jsonl.gz"
./build/gen_ladder_golden_9 rand 20 160 2 | gzip -9 > "$OUT/ref_ladder_rand_9.jsonl.gz"
./build/gen_ladder_golden_19 rand 8 260 3 | gzip -9 > "$OUT/ref_ladder_rand_19.jsonl.gz"
JAX_PLATFORMS=cpu python dump_suite_probes.py | ./build/gen_ladder_golden_19 \
    | gzip -9 > "$OUT/ref_ladder_suite_19.jsonl.gz"
ls -la "$OUT"
