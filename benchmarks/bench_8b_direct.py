"""Direct 32-layer 8B-geometry decode step (NOT slope-extrapolated):
int8 weights + int8 KV, 32 reqs @900 ctx (timed_scan holds two pool
copies, so the 64-req bench shape does not fit beside 7GB of weights).

Measured r3: 417us/layer -> 2401-2418 tok/s, within 3% of the
(weights + KV stream)/HBM_BW + attention component model and consistent
with bench_suite's 2L/4L slope method (629us/layer at the bigger
B=64 @1.5k shape). Run: python benchmarks/bench_8b_direct.py"""
import sys
sys.path.insert(0, "/root/repo")  # noqa: E402
import jax, jax.numpy as jnp
from xf_flash_attention_cutlass_tpu.models.llama import (
    LlamaConfig, init_params, pack_params_for_decode, quantize_params,
)
from xf_flash_attention_cutlass_tpu.serve.engine import decode_core
from xf_flash_attention_cutlass_tpu.utils.profiling import timed_scan

n_layers = 32
cfg = LlamaConfig(
    vocab_size=8192, dim=4096, n_layers=n_layers, n_heads=32,
    n_kv_heads=8, ffn_dim=14336, max_seq_len=4096,
)
# init + quantize on CPU (the bf16 8B tree is 16GB -- larger than HBM);
# only the int8 tree ships to the chip
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    params = init_params(jax.random.PRNGKey(0), cfg)
    params = quantize_params(params)
tpu = jax.devices()[0]
params = jax.tree_util.tree_map(lambda x: jax.device_put(x, tpu), params)
params = pack_params_for_decode(params)
B, page, mp = 32, 256, 4
num_pages = B * mp + 1
shape = (n_layers, num_pages, cfg.n_kv_heads, page, cfg.head_dim)
pools = dict(
    k=jnp.zeros(shape, jnp.int8), v=jnp.zeros(shape, jnp.int8),
    k_s=jnp.ones(shape[:-1], jnp.float32),
    v_s=jnp.ones(shape[:-1], jnp.float32),
)
bt = jnp.arange(B * mp, dtype=jnp.int32).reshape(B, mp)
kv_lens = jnp.full((B,), 900, jnp.int32)
tokens = jnp.zeros((B, 1), jnp.int32)

def step(carry, params, bt, kv_lens):
    t, pools = carry
    nt, _, pools = decode_core(params, t, pools, bt, kv_lens, cfg, "int8")
    return (nt[:, None].astype(jnp.int32), pools)

for rep in range(2):
    t = timed_scan(step, (tokens, pools), params, bt, kv_lens)
    print(f"32-layer direct: {t*1e6:.0f}us/step -> {B/t:.0f} tok/s "
          f"({t/n_layers*1e6:.0f}us/layer)", flush=True)
