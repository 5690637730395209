// MCTS golden-fixture generator: runs the REFERENCE's own tree-search
// node machinery (/root/reference/src_cpp/elf/ai/tree_search/
// tree_search_node.h: NodeT/EdgeInfo/SearchTreeT — PUCT scoring with
// first-play urgency, virtual loss, unsignedMeanQ updates, lazy child
// allocation, edge-stat backprop) over 9x9 Go positions with a
// deterministic pseudo-NN, and dumps per-rollout trajectories and final
// root edge statistics as JSON.
//
// The rollout loop replicates TreeSearchSingleThreadT::single_rollout /
// batch_rollouts at num_rollouts_per_batch=1 (tree_search.h:201,:264),
// and the actor replicates the Go MCTSActor's pre_evaluate terminal
// shortcut, pass gating (incl. remove_pass_if_dangerous's
// lastMove-not-pass condition) and pi2response legal renormalization
// (elfgames/go/mcts/mcts.h:185,:232,:262).  Everything in this file is
// elf_tpu's own code; the reference is only compiled against.
//
// tests/test_golden_mcts.py replays the same searches through
// elf_tpu.search.mcts and demands identical visit counts.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "elf/ai/tree_search/tree_search_node.h"
#include "elfgames/go/base/go_state.h"

using elf::ai::tree_search::EdgeInfo;
using elf::ai::tree_search::NodeResponseT;
using elf::ai::tree_search::InvalidNodeId;
using elf::ai::tree_search::NodeId;
using elf::ai::tree_search::SearchAlgoOptions;

using Node = elf::ai::tree_search::NodeT<GoState, Coord>;
using SearchTree = elf::ai::tree_search::SearchTreeT<GoState, Coord>;

namespace {

constexpr int N = BOARD_SIZE;
constexpr int N2 = N * N;
constexpr int kPass = N2; // elf_tpu flat action for pass

// elf_tpu flat action <-> reference Coord (row-major: flat = y*N + x)
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

// bfloat16 round-to-nearest-even (the elf_tpu tree stores priors bf16)
float bf16_round(float x) {
  uint32_t u;
  memcpy(&u, &x, 4);
  uint32_t lsb = (u >> 16) & 1;
  u += 0x7fffu + lsb;
  u &= 0xffff0000u;
  float r;
  memcpy(&r, &u, 4);
  return r;
}

// deterministic pseudo-NN: distinct per-action raw weights (a bijective
// permutation mapped onto a geometric ladder of exactly-representable
// floats spaced 2 bfloat16 ulps apart, so normalized priors stay
// distinct after the tree's bf16 rounding — otherwise unordered_map
// iteration order decides reference ties, which lockstep argmax cannot
// mirror) + a value that is an exact float expression of the stone
// count difference
float raw_prior(int flat) {
  int perm = (flat * 37 + 13) % (N2 + 1);
  return ldexpf(1.0f + (float)(perm % 64) / 64.0f, perm / 64);
}

float pseudo_value(const GoState& s) {
  int nb = 0, nw = 0;
  for (int i = 0; i < N2; ++i) {
    Stone st = s.board()._infos[flat2coord(i)].color;
    if (st == S_BLACK)
      ++nb;
    else if (st == S_WHITE)
      ++nw;
  }
  float v = (float)(nb - nw) * 0.05f;
  if (v > 1.0f)
    v = 1.0f;
  if (v < -1.0f)
    v = -1.0f;
  return v;
}

struct ActorParams {
  float komi = 7.5f;
  int ply_pass_enabled = 0;
  bool remove_pass_if_dangerous = true;
};

// mcts/mcts.h MCTSActor::evaluate semantics with the pseudo-NN
void evaluate_state(const GoState& s, const ActorParams& p,
                    NodeResponseT<Coord>* resp) {
  resp->q_flip = s.nextPlayer() == S_WHITE;
  resp->pi.clear();
  if (s.terminated()) {
    // pre_evaluate terminal shortcut (mcts.h:185)
    resp->value = s.evaluate(p.komi) > 0 ? 1.0f : -1.0f;
    return;
  }
  resp->value = pseudo_value(s);

  bool pass_enabled = s.getPly() >= p.ply_pass_enabled;
  if (p.remove_pass_if_dangerous && pass_enabled && s.lastMove() != M_PASS) {
    bool black_win = s.evaluate(p.komi) > 0;
    if ((black_win && s.nextPlayer() == S_WHITE) ||
        (!black_win && s.nextPlayer() == S_BLACK)) {
      pass_enabled = false;
    }
  }

  // pi2response: keep legal moves with raw probs, renormalize (mcts.h:262)
  std::vector<std::pair<Coord, float>> kept;
  for (int flat = 0; flat < N2; ++flat) {
    Coord c = flat2coord(flat);
    if (s.checkMove(c))
      kept.emplace_back(c, raw_prior(flat));
  }
  if (pass_enabled)
    kept.emplace_back((Coord)M_PASS, raw_prior(kPass));
  if (kept.empty())
    kept.emplace_back((Coord)M_PASS, 1.0f);
  float total = 1e-10f;
  for (auto& kv : kept)
    total += kv.second;
  for (auto& kv : kept)
    kv.second = bf16_round(kv.second / total);
  resp->pi = kept;
}

// deterministic root prefix: k moves, each the j-th legal move with
// j = (i*37 + 11) % num_legal (mirrored in tests/test_golden_mcts.py)
void play_prefix(GoState* s, int k) {
  for (int i = 0; i < k; ++i) {
    std::vector<Coord> legal;
    GroupId4 ids;
    for (int flat = 0; flat < N2; ++flat) {
      Coord c = flat2coord(flat);
      if (TryPlay2(&s->board(), c, &ids))
        legal.push_back(c);
    }
    if (legal.empty())
      return;
    Coord c = legal[(i * 37 + 11) % legal.size()];
    if (!s->forward(c))
      s->forward(M_PASS);
  }
}

struct Traj {
  Node* leaf = nullptr;
  std::vector<std::pair<Node*, Coord>> traj;
  std::vector<int> traj_flat;
};

// single_rollout (tree_search.h:264)
Traj single_rollout(Node* root, SearchTree& tree,
                    const SearchAlgoOptions& alg, float virtual_loss) {
  Node* node = root;
  Traj t;
  int depth = 0;
  while (node->isVisited()) {
    Coord action;
    bool has_move = node->findMove(alg, depth, &action, nullptr);
    if (!has_move)
      break;
    if (virtual_loss > 0)
      node->addVirtualLoss(action, virtual_loss);
    t.traj.emplace_back(node, action);
    t.traj_flat.push_back(coord2flat(action));
    NodeId next = node->followEdge(action, tree);
    Node* next_node = tree[next];
    if (next_node == nullptr)
      break;
    Node* parent = node;
    bool ok = next_node->setStateIfUnset([&]() -> GoState* {
      GoState* st = new GoState(*parent->getStatePtr());
      if (!st->forward(action)) {
        delete st;
        return nullptr;
      }
      return st;
    });
    if (!ok)
      break;
    node = next_node;
    ++depth;
  }
  t.leaf = node;
  return t;
}

void run_search(int prefix_moves, int num_rollouts, int per_batch,
                const SearchAlgoOptions& alg, float virtual_loss,
                const ActorParams& params) {
  GoState root_state;
  play_prefix(&root_state, prefix_moves);

  SearchTree tree;
  Node* root = tree.getRootNode();
  root->setStateIfUnset([&]() { return new GoState(root_state); });

  // root evaluation up front (elf_tpu's mcts_root_prepare phase)
  {
    NodeResponseT<Coord> resp;
    evaluate_state(root_state, params, &resp);
    root->setEvaluation(resp);
  }

  printf("{\"prefix\":%d,\"rollouts\":%d,\"per_batch\":%d,\"c_puct\":%.9g,",
         prefix_moves, num_rollouts, per_batch, alg.c_puct);
  printf("\"uqz\":%d,\"ruqz\":%d,\"vl\":%.9g,", (int)alg.unexplored_q_zero,
         (int)alg.root_unexplored_q_zero, virtual_loss);
  printf("\"root_value\":%.9g,\"trajs\":[", root->getValue());

  int n_batches = num_rollouts / per_batch;
  bool first_traj = true;
  for (int b = 0; b < n_batches; ++b) {
    // batch_rollouts (tree_search.h:201): m selects under virtual loss,
    // dedup by leaf, one eval + ONE backprop per distinct leaf removing
    // all its virtual losses
    std::vector<Traj> trajs;
    for (int j = 0; j < per_batch; ++j)
      trajs.push_back(single_rollout(root, tree, alg, virtual_loss));

    // dedup preserving first-occurrence order (final stats are
    // order-independent; ordering only matters for determinism of dump)
    std::vector<std::pair<Traj*, int>> uniq;
    for (Traj& t : trajs) {
      bool found = false;
      for (auto& u : uniq) {
        if (u.first->leaf == t.leaf) {
          u.second++;
          found = true;
          break;
        }
      }
      if (!found)
        uniq.emplace_back(&t, 1);
    }
    for (auto& u : uniq) {
      Node* leaf = u.first->leaf;
      if (leaf->requestEvaluation()) {
        NodeResponseT<Coord> resp;
        evaluate_state(*leaf->getStatePtr(), params, &resp);
        leaf->setEvaluation(resp);
      }
      float reward = leaf->getValue();
      for (auto& pa : u.first->traj) {
        pa.first->updateEdgeStats(pa.second, reward,
                                  virtual_loss * u.second);
      }
    }
    for (const Traj& t : trajs) {
      printf("%s[", first_traj ? "" : ",");
      first_traj = false;
      for (size_t i = 0; i < t.traj_flat.size(); ++i)
        printf("%s%d", i ? "," : "", t.traj_flat[i]);
      printf("]");
    }
  }

  // final root edge stats in elf_tpu flat-action order
  printf("],\"edges\":[");
  bool first = true;
  for (const auto& p : root->getStateActions()) {
    const EdgeInfo& e = p.second;
    printf("%s{\"a\":%d,\"n\":%d,\"w\":%.9g,\"prior\":%.9g}",
           first ? "" : ",", coord2flat(p.first), e.num_visits, e.reward,
           (double)e.prior_probability);
    first = false;
  }
  printf("],\"root_n\":%d,\"root_umean\":%.9g}\n", root->getNumVisits(),
         root->getMeanUnsignedQ());
}

} // namespace

int main() {
  ActorParams params;
  SearchAlgoOptions alg;
  alg.use_prior = true;

  // config sweep: FPU on/off, two c_puct values, several root positions,
  // single-rollout batches and virtual-loss batches (m=8)
  struct Cfg {
    int prefix;
    int rollouts;
    int per_batch;
    float c_puct;
    bool uqz;
    float vl;
  };
#ifdef BOARD9x9
  const Cfg cfgs[] = {
      {0, 64, 1, 1.5f, false, 1.0f},  {8, 64, 1, 1.5f, false, 1.0f},
      {20, 96, 1, 0.85f, false, 1.0f}, {33, 64, 1, 1.5f, false, 1.0f},
      {20, 64, 1, 1.5f, true, 1.0f},  {57, 80, 1, 0.85f, false, 1.0f},
      {8, 96, 8, 0.85f, false, 5.0f},  {33, 96, 8, 1.5f, false, 5.0f},
      {57, 64, 8, 0.85f, false, 1.0f},
  };
#else
  const Cfg cfgs[] = {
      {24, 64, 1, 1.5f, false, 1.0f},
      {90, 64, 8, 0.85f, false, 5.0f},
  };
#endif
  for (const Cfg& c : cfgs) {
    alg.c_puct = c.c_puct;
    alg.unexplored_q_zero = c.uqz;
    alg.root_unexplored_q_zero = false;
    run_search(c.prefix, c.rollouts, c.per_batch, alg, c.vl, params);
  }
  return 0;
}
