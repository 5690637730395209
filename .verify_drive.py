import os
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'
import sys
sys.path.insert(0, '/root/repo')
import time, functools
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_platforms', 'cpu')  # axon sitecustomize pins the env var

from elf_tpu.config import OptionSpec, GameOptions, MCTSOptions, TrainOptions, ReplayOptions
from elf_tpu.env.go import state as gostate
from elf_tpu.env.go.state import init_state, step, legal_moves
from elf_tpu.env.go.features import extract_agz
from elf_tpu.models.resnet import ModelConfig
from elf_tpu.training.trainer import Trainer, save_checkpoint, load_checkpoint, version_from_path
from elf_tpu.search.mcts import MCTSConfig, run_mcts
from elf_tpu.selfplay.records import make_record, Records
from elf_tpu.training.replay import ReplayBuffer, sample_training_batch
from elf_tpu.sgf import parse_sgf, serialize_sgf
from elf_tpu.env.go.coords import sgf_string_to_moves

spec = OptionSpec.from_dataclasses([GameOptions, MCTSOptions, TrainOptions])
om = spec.parse(['--board_size', '9', '--num_rollouts', '16', '--num_block', '2', '--dim', '32'])
g = om.get(GameOptions); mo = om.get(MCTSOptions); to = om.get(TrainOptions)
print('OPTIONS ok:', g.board_size, mo.num_rollouts, to.num_block, flush=True)

size = g.board_size; B = 4
cfg = ModelConfig(board_size=size, num_planes=18, num_block=to.num_block, dim=to.dim, use_bf16=False)
tr = Trainer(cfg, to)
ts = tr.init_state(jax.random.PRNGKey(0))
eval_raw = tr.make_eval_fn()
eval_fn = lambda f, tp: eval_raw(ts.params, ts.batch_stats, f)

mcfg = MCTSConfig(num_rollouts=mo.num_rollouts, rollouts_per_batch=4, komi=g.komi, rotation_flip=True)
mcts_jit = jax.jit(functools.partial(run_mcts, eval_fn=eval_fn, cfg=mcfg, size=size))

s = init_state(B, size)
moves = []
t0 = time.time()
for ply in range(6):
    res, tree = mcts_jit(root_core=s.core, root_hist=s.stone_hist,
                         root_hist_len=s.hist_len, rng=jax.random.PRNGKey(ply))
    a = np.asarray(res.best_action)
    lm = np.asarray(legal_moves(s, size))
    assert all(lm[b, a[b]] for b in range(B)), 'MCTS picked illegal move!'
    moves.append(int(a[0]))
    s, info = step(s, a, size)
    assert not bool(np.asarray(info.illegal).any())
print('SELFPLAY 6 plies ok in %.1fs, moves=%s' % (time.time() - t0, moves), flush=True)
print('root_value sample:', np.asarray(res.root_value)[:2],
      'policy sum:', float(np.asarray(res.mcts_policy).sum(1)[0]), flush=True)

score = np.asarray(gostate.evaluate(s, size, komi=g.komi))
print('EVAL ok:', score[:2], flush=True)
pis = [np.asarray(res.mcts_policy[0])] * len(moves)
rec = make_record(moves, float(score[0]), pis, [0.0] * len(moves), size)
rt = Records(identity='test', records=[rec])
rt2 = Records.from_json_string(rt.to_json_string())
assert sgf_string_to_moves(rt2.records[0].result.content, size) == moves
print('RECORD roundtrip ok:', rt2.records[0].result.content[:40], flush=True)

buf = ReplayBuffer(ReplayOptions(num_reader=2, q_min_size=1, q_max_size=10))
for i in range(4):
    buf.insert(rec)
batch = sample_training_batch(buf, 2, size, np.random.RandomState(0))
assert batch is not None
print('REPLAY ok:', buf.info(), flush=True)

feats = extract_agz(s, np.zeros(B, np.int32), size)
train_step = jax.jit(tr.make_train_step())
winner = jnp.ones((B,))
ts2, stats = train_step(ts, feats, jnp.asarray(np.asarray(res.mcts_policy)), winner)
print('TRAIN ok: loss=%.3f step=%d' % (float(stats['loss/total']), int(ts2.step)), flush=True)

import tempfile
d = tempfile.mkdtemp()
p = save_checkpoint(d, ts2)
ts3 = load_checkpoint(d, template=ts2)
assert int(ts3.step) == int(ts2.step) == version_from_path(p)
leaf0 = jax.tree.leaves(ts2.params)[0]; leaf1 = jax.tree.leaves(ts3.params)[0]
np.testing.assert_allclose(np.asarray(leaf0), np.asarray(leaf1))
print('CKPT ok:', p, flush=True)

from elf_tpu.sgf.sgf import game_from_moves
gm = game_from_moves(moves, size, komi=g.komi)
txt = serialize_sgf(gm)
back = parse_sgf(txt)
assert [m for _, m in back.main_moves()] == moves
print('SGF ok:', txt[:60], flush=True)

# === probes ===
st = init_state(1, size)
st, _ = step(st, np.array([81]), size); st, _ = step(st, np.array([81]), size)
before = np.asarray(st.core.stones).copy()
st2, inf = step(st, np.array([0]), size)
assert (np.asarray(st2.core.stones) == before).all() and not bool(inf.illegal[0])
print('PROBE frozen-after-termination ok', flush=True)

s0 = init_state(1, size); s0, _ = step(s0, np.array([40]), size)
s1, inf = step(s0, np.array([40]), size)
assert bool(inf.illegal[0]) and int(s1.core.ply[0]) == 1
print('PROBE occupied-illegal ok', flush=True)

try:
    parse_sgf('garbage no tree')
    print('PROBE bad-sgf: NO ERROR (unexpected)')
except ValueError as e:
    print('PROBE bad-sgf ok:', e, flush=True)

import dataclasses
from elf_tpu.config import opt
@dataclasses.dataclass
class Bad:
    komi: float = opt(6.5, 'conflicting default')
try:
    OptionSpec.from_dataclasses([GameOptions, Bad])
    print('PROBE option-collision: NO ERROR (unexpected)')
except ValueError:
    print('PROBE option-collision ok', flush=True)
print('ALL VERIFY FLOWS PASSED')
