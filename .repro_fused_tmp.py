import traceback
import numpy as np
import jax
import jax.numpy as jnp
from video_coding_tpu.entropy import pallas_encode, tpu_encode
from video_coding_tpu.entropy.tables import pack_encoder_tables
from video_coding_tpu.model.encoder import Parameters

rng = np.random.default_rng(7)
p = Parameters.c420(192, 128, 75)
tabs = pack_encoder_tables(
    [p.dc_huffman_tables[0].data, p.dc_huffman_tables[1].data, p.dc_huffman_tables[1].data],
    [p.ac_huffman_tables[0].data, p.ac_huffman_tables[1].data, p.ac_huffman_tables[1].data])
dcb, dcl, acb, acl = tpu_encode.device_encoder_tables(tabs)
B, S = 6, 96
N = S * B
sched = np.array([0, 0, 0, 0, 1, 2], np.int32)
comp = np.resize(sched, N)
q = np.zeros((N, 64), np.int32)
mask = rng.random((N, 64)) < 0.15
q[mask] = rng.integers(-255, 256, mask.sum())
prev = np.full(B, -1, np.int32)
try:
    out, lens, ovf = pallas_encode.encode_segments_pallas(
        jnp.asarray(q), jnp.asarray(comp), jnp.asarray(prev),
        jnp.asarray(dcb), jnp.asarray(dcl), jnp.asarray(acb), jnp.asarray(acl),
        blocks_per_segment=B, max_seg_bytes=B * 24 + 64, interpret=False)
    out = np.asarray(out); lens = np.asarray(lens)
    from video_coding_tpu.entropy import scan as escan
    ref = escan.encode_scan(q, comp, B, tabs)
    ok = all(out[s, :lens[s]].tobytes() == ref[s] for s in range(S))
    print("FUSED ON-CHIP OK, bit-identical:", ok)
except Exception:
    traceback.print_exc()
