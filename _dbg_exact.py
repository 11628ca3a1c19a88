import os, glob, gzip, json, time
import jax, jax.numpy as jnp, numpy as np
from fastvideotagging_tpu.models import get_model

model_name, batch_size, clip_len, crop, n_steps = "r2plus1d_18", 32, 16, 112, 4
trace_dir = "/tmp/fvt_exact_trace"

model = get_model(model_name, num_classes=101)
x0 = jnp.asarray(np.random.default_rng(0).standard_normal(
    (batch_size, clip_len, crop, crop, 3)), jnp.bfloat16)
variables = jax.jit(model.init, static_argnames="train")(
    jax.random.PRNGKey(0), x0[:1], train=False)

@jax.jit
def step(vs, xi):
    y = model.apply(vs, xi, train=False)
    # evolving input: content-identical dispatches are deduped
    return xi + (jnp.tanh(y.sum()) * 1e-2).astype(xi.dtype)

hlo = step.lower(variables, x0).compile().as_text()
print("hlo chars", len(hlo), flush=True)

def sync(x):
    float(jnp.asarray(x.reshape(-1)[0], jnp.float32))

c = step(variables, x0)
sync(c)
os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    t0 = time.perf_counter()
    for _ in range(n_steps):
        c = step(variables, c)
    sync(c)
    print("wall for %d steps: %.1f ms" % (n_steps, (time.perf_counter()-t0)*1e3), flush=True)
f = sorted(glob.glob(trace_dir + '/**/*.trace.json.gz', recursive=True))[-1]
ev = json.load(gzip.open(f))['traceEvents']
pid_names = {e['pid']: e['args'].get('name','') for e in ev if e.get('ph')=='M' and e.get('name')=='process_name'}
tid_names = {(e['pid'],e['tid']): e['args'].get('name','') for e in ev if e.get('ph')=='M' and e.get('name')=='thread_name'}
for e in sorted((e for e in ev if e.get('ph')=='X' and 'dur' in e and 'TPU' in pid_names.get(e.get('pid'),'') and tid_names.get((e['pid'],e['tid']))=='XLA Modules'), key=lambda e: e['ts']):
    print(' ', e['name'][:52], 'dur=%.0fus' % e['dur'])
