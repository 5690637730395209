// Ladder golden generator: runs the REFERENCE'S OWN ladder solver
// (checkLadder / checkLadderUseSearch, /root/reference/src_cpp/elfgames/
// go/base/board.cc:300-521) over positions and dumps per-move ladder
// depths.  tests/test_golden_ladder.py replays the same positions through
// elf_tpu's native ladder solver (native/ladder.c) and demands identical
// depths — exact behavioral parity with the reference's tactical
// reading.  This file is elf_tpu's own code; reference sources are only
// compiled against.
//
// Modes:
//   gen_ladder_golden rand <num_games> <max_plies> <scan_every>
//     seeded random self-play positions, scanning every legal move.
//   gen_ladder_golden stdin
//     each input line: "<upto> <f1> <f2> ... <fn>" (flat moves, pass =
//     N2); replays `upto` moves from an empty board and scans.  Used to
//     pump the ladder_suite probe positions through the reference.
//
// Output: one JSON line per scanned position:
//   {"stones": "...", "player": 1|2, "ko_point": -1|flat,
//    "ko_color": 0|1|2, "depths": [[flat, depth], ...]}
// `depths` lists every legal move whose StoneLibertyAnalysis has
// exactly two empty neighbors (checkLadder's gate; everything else is
// trivially depth 0).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <string>
#include <vector>

#include "elfgames/go/base/go_state.h"

namespace {
constexpr int N = BOARD_SIZE;
constexpr int N2 = N * N;
constexpr int kPass = N2;

Coord flat2coord(int flat) {
  if (flat >= N2)
    return (Coord)M_PASS;
  return OFFSETXY(flat % N, flat / N);
}

int coord2flat(Coord c) {
  if (c == M_PASS)
    return kPass;
  return Y(c) * N + X(c);
}

std::string stones_str(const Board& b) {
  std::string out(N2, '0');
  for (int i = 0; i < N2; ++i) {
    Stone st = b._infos[flat2coord(i)].color;
    if (st == S_BLACK)
      out[i] = '1';
    else if (st == S_WHITE)
      out[i] = '2';
  }
  return out;
}

void scan_position(const GoState& s) {
  const Board& b = s.board();
  Stone player = b._next_player;
  int ko_flat = -1, ko_color = 0;
  if (b._ko_age == 0 && b._simple_ko != M_PASS) {
    ko_flat = coord2flat(b._simple_ko);
    ko_color = (int)b._simple_ko_color;
  }
  std::vector<std::pair<int, int>> depths;
  GroupId4 ids;
  for (int f = 0; f < N2; ++f) {
    if (!TryPlay2(&b, flat2coord(f), &ids))
      continue;
    if (ids.liberty != 2)
      continue;  // checkLadder's gate: everything else is depth 0
    int d = checkLadder(&b, &ids, player);
    depths.emplace_back(f, d);
  }
  if (depths.empty())
    return;
  printf("{\"stones\":\"%s\",\"player\":%d,\"ko_point\":%d,"
         "\"ko_color\":%d,\"depths\":[",
         stones_str(b).c_str(), (int)player, ko_flat, ko_color);
  for (size_t i = 0; i < depths.size(); ++i)
    printf("%s[%d,%d]", i ? "," : "", depths[i].first, depths[i].second);
  printf("]}\n");
}

void random_games(int num_games, int max_plies, int scan_every) {
  for (int g = 0; g < num_games; ++g) {
    std::mt19937 rng(9000 + g);
    GoState s;
    for (int ply = 0; ply < max_plies && !s.terminated(); ++ply) {
      std::vector<int> legal;
      GroupId4 ids;
      for (int f = 0; f < N2; ++f)
        if (TryPlay2(&s.board(), flat2coord(f), &ids))
          legal.push_back(f);
      if (legal.empty())
        break;
      if (ply % scan_every == 0)
        scan_position(s);
      int f = legal[rng() % legal.size()];
      s.forward(flat2coord(f));
    }
  }
}

void from_stdin() {
  char line[1 << 16];
  while (fgets(line, sizeof(line), stdin)) {
    std::vector<int> moves;
    int upto = -1;
    char* p = line;
    char* end;
    long v = strtol(p, &end, 10);
    if (end == p)
      continue;
    upto = (int)v;
    p = end;
    while (true) {
      v = strtol(p, &end, 10);
      if (end == p)
        break;
      moves.push_back((int)v);
      p = end;
    }
    GoState s;
    for (int i = 0; i < upto && i < (int)moves.size(); ++i)
      if (!s.forward(flat2coord(moves[i])))
        break;
    scan_position(s);
  }
}

}  // namespace

int main(int argc, char** argv) {
  if (argc >= 2 && std::string(argv[1]) == "rand") {
    int num_games = argc > 2 ? atoi(argv[2]) : 8;
    int max_plies = argc > 3 ? atoi(argv[3]) : 180;
    int scan_every = argc > 4 ? atoi(argv[4]) : 2;
    random_games(num_games, max_plies, scan_every);
    return 0;
  }
  from_stdin();
  return 0;
}
