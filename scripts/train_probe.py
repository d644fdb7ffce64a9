import sys; import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools, time
import jax, jax.numpy as jnp, numpy as np
from peppa_tpu.config import default_config
from peppa_tpu.data.types import ClipBatch
from peppa_tpu.models.dual_encoder import init_model
from peppa_tpu.training.optimization import make_optimizer
from peppa_tpu.training.state import TrainState
from peppa_tpu.ops.loss import triplet_loss

from peppa_tpu.utils.compile_cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
K = 4
frames, samples = 23, 101430
cfg = default_config(); cfg.training.precision = 'bf16'
if os.environ.get('TP_MIDPLANES'):
    cfg.video.midplanes_multiple = int(os.environ['TP_MIDPLANES'])
if os.environ.get('TP_REMAT'):
    cfg.tpu.remat_video = cfg.tpu.remat_audio = True
model, variables = init_model(cfg, jax.random.PRNGKey(0),
                              audio_samples=samples, video_frames=frames)
tx = make_optimizer(cfg.optimizer, accumulate_grad_batches=1,
                    params=variables['params'])
state = TrainState.create(variables, tx)

def one_step(state, key):
    kv, ka, kd = jax.random.split(key, 3)
    batch = ClipBatch(
        video=jax.random.uniform(kv, (B, frames, 100, 180, 3), jnp.float32),
        audio=jax.random.normal(ka, (B, samples), jnp.float32) * 0.1,
        video_duration=jnp.full((B,), 2.3), audio_duration=jnp.full((B,), 2.3),
        video_frames=jnp.full((B,), frames, jnp.int32),
        audio_samples=jnp.full((B,), samples, jnp.int32))
    def loss_fn(params):
        vs = {'params': params, 'batch_stats': state.batch_stats}
        out, mut = model.apply(vs, batch, train=True,
                               rngs={'dropout': kd, 'layerdrop': kd},
                               mutable=['batch_stats'])
        return triplet_loss(out.video, out.audio, margin=cfg.margin), mut['batch_stats']
    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    return state.apply_gradients(grads, stats), loss

@functools.partial(jax.jit, static_argnames=('k',), donate_argnums=(0,))
def run_k(state, seed, k):
    keys = jax.random.split(jax.random.PRNGKey(seed), k)
    def body(carry, key):
        st, acc = carry
        st, loss = one_step(st, key)
        return (st, acc + loss), None
    (state, acc), _ = jax.lax.scan(body, (state, 0.0), keys)
    return state, acc

@jax.jit
def trivial(seed):
    return jnp.sum(jax.random.normal(jax.random.PRNGKey(seed), (8, 8)))

def fetch(x): return float(np.asarray(x))

t0=time.perf_counter(); state, acc = run_k(state, 0, K); v=fetch(acc)
print(f'compile+first: {time.perf_counter()-t0:.1f}s loss={v/K:.4f}', flush=True)
overhead = min((lambda t: (fetch(trivial(i)), time.perf_counter()-t)[1])(time.perf_counter()) for i in range(5))
best = None
for r in range(2):
    t0=time.perf_counter(); state, acc = run_k(state, 1+r, K); fetch(acc)
    dt = (time.perf_counter()-t0-overhead)/K
    best = dt if best is None else min(best, dt)
print(f'train step B={B}: {best*1000:.1f} ms -> {B/best:.1f} clips/s', flush=True)
