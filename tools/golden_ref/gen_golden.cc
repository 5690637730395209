// Golden-fixture generator: plays seeded random games through the
// READ-ONLY reference board library (/root/reference/src_cpp/elfgames/go/
// base: board.cc, go_state.cc, board_feature.cc) and dumps per-ply
// trajectories + feature planes as JSON.  The emitted fixtures are the
// ground truth for tests/test_golden_ref_trajectories.py, which replays
// them through elf_tpu's vectorized engine and demands bit-exact parity
// (BASELINE.md correctness target: bit-exact trajectories vs ELF).
//
// Everything in this file is elf_tpu's own code; the reference sources are
// only COMPILED AGAINST (read-only), never copied.
//
// Output conventions (chosen to match elf_tpu, not the reference export
// layout):
//  - flat point index = row * N + col, where the reference coord c has
//    col = X(c), row = Y(c); pass = N*N.
//  - stones strings: one char per point in flat order, '0' empty,
//    '1' black, '2' white.
//  - legal masks: hex string, bit i = flat point i legal for the player
//    to move (TryPlay2, i.e. suicide + simple-ko rules).
//  - feature dumps keep the REFERENCE layout (plane-major, then x-major:
//    idx = plane*N*N + x*N + y) and are transposed in the Python test.

#include <cstdint>
#include <cstdio>
#include <random>
#include <string>
#include <vector>

#include "elfgames/go/base/board_feature.h"
#include "elfgames/go/base/go_state.h"

namespace {

std::vector<std::vector<float>> g_agz, g_df;
std::vector<std::pair<int, int>> g_meta;

constexpr int N = BOARD_SIZE;
constexpr int N2 = N * N;
constexpr int kPass = N2;

Coord flat2coord(int flat) {
  int row = flat / N, col = flat % N;
  return OFFSETXY(col, row);
}

int coord2flat(Coord c) {
  if (c == M_PASS)
    return kPass;
  return Y(c) * N + X(c);
}

std::string legal_hex(const GoState& s) {
  std::vector<bool> legal(N2, false);
  GroupId4 ids;
  for (int i = 0; i < N2; ++i) {
    legal[i] = TryPlay2(&s.board(), flat2coord(i), &ids);
  }
  // hex, little-endian nibbles over flat index
  std::string out;
  for (int i = 0; i < N2; i += 4) {
    int v = 0;
    for (int j = 0; j < 4 && i + j < N2; ++j)
      if (legal[i + j])
        v |= 1 << j;
    out += "0123456789abcdef"[v];
  }
  return out;
}

std::string stones_str(const GoState& s) {
  std::string out(N2, '0');
  for (int i = 0; i < N2; ++i) {
    Stone st = s.board()._infos[flat2coord(i)].color;
    if (st == S_BLACK)
      out[i] = '1';
    else if (st == S_WHITE)
      out[i] = '2';
  }
  return out;
}

void dump_floats(const std::vector<float>& v) {
  printf("[");
  for (size_t i = 0; i < v.size(); ++i)
    printf("%s%.9g", i ? "," : "", v[i]);
  printf("]");
}

void play_game(uint32_t seed, int handicap, int max_plies, double pass_prob) {
  std::mt19937 rng(seed);
  GoState s;
  if (handicap > 0)
    s.applyHandicap(handicap);

  printf("{\"seed\":%u,\"handicap\":%d,\"size\":%d,", seed, handicap, N);
  printf("\"start_player\":%d,", (int)s.nextPlayer());
  printf("\"start_stones\":\"%s\",", stones_str(s).c_str());

  std::vector<int> actions;
  std::vector<int> players;
  std::vector<std::string> legals;
  std::vector<std::string> stones;
  std::vector<int> terms;

  std::uniform_real_distribution<double> unif(0.0, 1.0);
  int ply = 0;
  while (!s.terminated() && ply < max_plies) {
    legals.push_back(legal_hex(s));
    players.push_back((int)s.nextPlayer());

    // pick: small pass prob, else uniform random legal move
    std::vector<int> cand;
    cand.reserve(N2);
    const std::string& hexmask = legals.back();
    for (int i = 0; i < N2; ++i) {
      int v = hexmask[i / 4] <= '9' ? hexmask[i / 4] - '0'
                                    : hexmask[i / 4] - 'a' + 10;
      if (v & (1 << (i % 4)))
        cand.push_back(i);
    }
    int flat;
    if (cand.empty() || unif(rng) < pass_prob) {
      flat = kPass;
    } else {
      flat = cand[std::uniform_int_distribution<int>(
          0, (int)cand.size() - 1)(rng)];
    }
    Coord c = flat == kPass ? (Coord)M_PASS : flat2coord(flat);
    if (!s.forward(c)) {
      // legal-by-TryPlay2 move rejected (shouldn't happen): record a pass
      bool ok = s.forward(M_PASS);
      (void)ok;
      flat = kPass;
    }
    actions.push_back(flat);
    stones.push_back(stones_str(s));
    terms.push_back(s.terminated() ? 1 : 0);
    ++ply;

    if ((ply == 30 || ply == 75 || ply == 140) && !s.terminated()) {
      // ply 30: all 8 D4 codes (transform-convention coverage);
      // later plies: identity + one rot+flip
      for (int code = 0; code < 8; ++code) {
        if (ply != 30 && code != 0 && code != 5)
          continue;
        BoardFeature bf(s);
        bf.setD4Code(code);
        std::vector<float> agz, df;
        bf.extractAGZ(&agz);
        bf.extract(&df);
        g_agz.push_back(std::move(agz));
        g_df.push_back(std::move(df));
        g_meta.emplace_back(ply, code);
      }
    }
  }

  printf("\"actions\":[");
  for (size_t i = 0; i < actions.size(); ++i)
    printf("%s%d", i ? "," : "", actions[i]);
  printf("],\"players\":[");
  for (size_t i = 0; i < players.size(); ++i)
    printf("%s%d", i ? "," : "", players[i]);
  printf("],\"legal\":[");
  for (size_t i = 0; i < legals.size(); ++i)
    printf("%s\"%s\"", i ? "," : "", legals[i].c_str());
  printf("],\"stones\":[");
  for (size_t i = 0; i < stones.size(); ++i)
    printf("%s\"%s\"", i ? "," : "", stones[i].c_str());
  printf("],\"terminal\":[");
  for (size_t i = 0; i < terms.size(); ++i)
    printf("%s%d", i ? "," : "", terms[i]);
  printf("],");

  // feature probes
  printf("\"features\":[");
  for (size_t i = 0; i < g_meta.size(); ++i) {
    printf("%s{\"ply\":%d,\"d4\":%d,\"agz\":", i ? "," : "", g_meta[i].first,
           g_meta[i].second);
    dump_floats(g_agz[i]);
    printf(",\"df\":");
    dump_floats(g_df[i]);
    printf("}");
  }
  printf("],");
  g_agz.clear();
  g_df.clear();
  g_meta.clear();

  printf("\"final_ply\":%d,\"terminated\":%d,", ply, s.terminated() ? 1 : 0);
  printf("\"next_player\":%d,", (int)s.nextPlayer());
  printf("\"tt_score_raw\":%d,", simple_tt_scoring(s.board()));
  printf("\"eval_komi7.5\":%.9g}\n", s.evaluate(7.5f));
}

} // namespace

int main(int argc, char** argv) {
  int ngames = argc > 1 ? atoi(argv[1]) : 6;
  int max_plies = argc > 2 ? atoi(argv[2]) : (N == 9 ? 170 : 220);
  for (int g = 0; g < ngames; ++g) {
    int handicap = 0;
    if (N == 19 && g >= ngames - 2)
      handicap = (g == ngames - 2) ? 2 : 5; // last two games: handicap
    play_game(1000u + g, handicap, max_plies, 0.02);
  }
  return 0;
}
