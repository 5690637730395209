// Wire-codec golden generator: the record wire format ships game moves
// as the reference's compact SGF move string (coords2sgfstr /
// sgfstr2coords, /root/reference/src_cpp/elfgames/go/sgf/sgf.h:87,:97 —
// the MsgResult "moves" field, common/record.h:184).  This tool calls
// the REFERENCE'S OWN inline codec on random coordinate sequences and
// dumps (flat moves, wire string) pairs; tests/test_golden_sgf_codec.py
// demands byte-identical strings and inverse parsing from elf_tpu's
// native codec.  This file is elf_tpu's own code.

#include <cstdio>
#include <random>
#include <string>
#include <vector>

#include "elfgames/go/sgf/sgf.h"

namespace {
constexpr int N = BOARD_SIZE;
constexpr int N2 = N * N;

Coord flat2coord(int flat) {
  if (flat >= N2)
    return (Coord)M_PASS;
  return OFFSETXY(flat % N, flat / N);
}
} // namespace

int main() {
  for (int g = 0; g < 12; ++g) {
    std::mt19937 rng(4242 + g);
    int len = 1 + (int)(rng() % 260);
    std::vector<Coord> moves;
    std::vector<int> flats;
    for (int i = 0; i < len; ++i) {
      // ~4% passes; moves may repeat (the codec is position-agnostic)
      int flat = (rng() % 25 == 0) ? N2 : (int)(rng() % N2);
      flats.push_back(flat);
      moves.push_back(flat2coord(flat));
    }
    std::string s = coords2sgfstr(moves);
    // round-trip through the reference parser as a self-check
    std::vector<Coord> back = sgfstr2coords(s);
    if (back != moves) {
      fprintf(stderr, "reference round-trip failed on game %d\n", g);
      return 1;
    }
    printf("{\"moves\":[");
    for (size_t i = 0; i < flats.size(); ++i)
      printf("%s%d", i ? "," : "", flats[i]);
    printf("],\"sgf\":\"%s\"}\n", s.c_str());
  }
  return 0;
}
