import json, time
import numpy as np, jax
from video_coding_tpu.common.bitstream import BitReader
from video_coding_tpu.common.frame import ChromaSubsampling, Frame
from video_coding_tpu.common.plane import Plane
from video_coding_tpu.model.decoder import Header, decode_a_frame
from video_coding_tpu.model.encoder import Parameters
from video_coding_tpu.runtime.engine import (JpegDecoderSession,
                                             JpegEncoderSession,
                                             JpegTranscodeSession)
W, H = 1920, 1080
mpix = W*H*1.5/1e6
mouse = decode_a_frame(open('/root/reference/jpeg/test_data/Mouse480.jpg','rb').read())
def tile(d,h,w):
    ph,pw = d.shape
    return np.tile(d,((h+ph-1)//ph,(w+pw-1)//pw))[:h,:w]
frame = Frame(Plane(data=tile(mouse.y.data,H,W).copy()),
              Plane(data=tile(mouse.u.data,H//2,W//2).copy()),
              Plane(data=tile(mouse.v.data,H//2,W//2).copy()),
              ChromaSubsampling.C420)
params = Parameters.c420(W,H,75)
stream = JpegEncoderSession(params, restart_interval=1).encode(frame)
bits = BitReader(stream); header = Header.decode(bits)
payload = stream[bits.bit_pos>>3:]
for mode in ("device","host"):
    t = JpegTranscodeSession(header, quality=75, restart_interval=1, entropy_out=mode)
    out = t.transcode(payload)   # compile+warm (ladder)
    out = t.transcode(payload)   # locked-budget graph
    t0 = time.perf_counter()
    it = 6
    for _ in range(it):
        out = t.transcode(payload)
    dt = (time.perf_counter()-t0)/it
    print(json.dumps({"bench":"transcode","entropy_out":mode,
                      "ms_per_frame":round(dt*1e3,2),"mpix_s":round(mpix/dt,1)}), flush=True)
