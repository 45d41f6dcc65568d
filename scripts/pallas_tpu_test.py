import time
import numpy as np
import jax, jax.numpy as jnp
from visual_odom_tpu.config import CameraIntrinsics, VOConfig
from visual_odom_tpu.io.synthetic import SyntheticStereoSequence
from visual_odom_tpu.ops.lk import LKParams, lk_track_pyramid, prepare_lk_image
from visual_odom_tpu.ops.lk_pallas import lk_track_pyramid_pallas
from visual_odom_tpu.frontend.featureset import empty_feature_state
from visual_odom_tpu.frontend.bucketing import detect_and_bucket

H, W = 376, 1241
intr = CameraIntrinsics(fx=718.856, fy=718.856, cx=W/2, cy=H/2, bf=-718.856*0.537, width=W, height=H)
cfg = VOConfig.for_image(H, W)
seq = SyntheticStereoSequence(intr, num_frames=2, seed=0, speed=0.8)
(l0, r0), (l1, r1) = seq.frame(0), seq.frame(1)
params = LKParams()
iml0 = prepare_lk_image(jnp.asarray(l0, jnp.float32), params)
imr0 = prepare_lk_image(jnp.asarray(r0, jnp.float32), params)
bucketed = detect_and_bucket(jnp.asarray(l0, jnp.float32), empty_feature_state(cfg.padded_features), cfg)
print("bucketed:", int(bucketed.valid.sum()), flush=True)

def timeit(name, fn, n=10):
    out = fn(); jax.block_until_ready(out)
    t = time.perf_counter()
    for _ in range(n):
        out = fn(); jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t)/n*1000:.2f} ms", flush=True)
    return out

t=time.time()
p_pal = timeit("pallas leg", lambda: lk_track_pyramid_pallas(iml0, imr0, bucketed.points, bucketed.valid, params))
print("total incl compile:", time.time()-t, flush=True)
p_ref = timeit("xla leg", lambda: lk_track_pyramid(iml0, imr0, bucketed.points, bucketed.valid, params))
sp = np.asarray(p_pal[1]); sr = np.asarray(p_ref[1])
print("status agree:", (sp == sr).mean(), flush=True)
both = sp & sr
d = np.abs(np.asarray(p_pal[0]) - np.asarray(p_ref[0]))[both]
print("pt max diff:", d.max() if both.any() else "n/a", flush=True)
