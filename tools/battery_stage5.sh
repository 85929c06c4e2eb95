#!/bin/bash
# Round-4 follow-on battery stage: on-chip shard_map smoke.
#
# Validates the two round-3/4 device paths that only ever ran on the
# virtual CPU mesh — the query-sharded mesh mAP eval (Pallas inside
# shard_map) and the gallery-sharded serving search — on the real chip
# with a 1-device mesh (same lowering, no second chip needed). Runs as a
# separate process from tools/when_up.sh (which was already mid-execution
# when this stage was written; bash reads running scripts incrementally,
# so appending to it would corrupt the run) and waits for the main
# battery's "=== done" so only one process holds the tunnel. Persists its
# own artifact — no collector changes needed.
#
# Usage:  nohup bash tools/battery_stage5.sh > /tmp/stage5.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
STATUS=/tmp/battery_status

for i in $(seq 1 720); do
  grep -q "^=== done" "$STATUS" 2>/dev/null && break
  sleep 90
done
grep -q "^=== done" "$STATUS" || {
  echo "stage5: main battery never finished $(date)" >> "$STATUS"; exit 1; }

echo "=== stage5 shard_map smoke $(date)" >> "$STATUS"
timeout 3600 python - > /tmp/batt_shard.log 2>&1 <<'PYEOF'
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

mesh = Mesh(np.array(jax.devices()[:1]).reshape(1), ("dp",))

from cmh_tpu.ops.map_pallas import calc_map_k_4dir_pallas_sharded
from cmh_tpu.ops.metrics import calc_map_k

rng = np.random.RandomState(1)
nq, nr, bits, classes = 128, 2048, 64, 8
qi, qt = (rng.choice([-1.0, 1.0], size=(nq, bits)).astype(np.float32)
          for _ in range(2))
ri, rt = (rng.choice([-1.0, 1.0], size=(nr, bits)).astype(np.float32)
          for _ in range(2))
ql = (rng.rand(nq, classes) > 0.5).astype(np.float32); ql[:, 0] = 1
rl = (rng.rand(nr, classes) > 0.5).astype(np.float32); rl[: nr // 3, 0] = 1
got = calc_map_k_4dir_pallas_sharded(qi, qt, ri, rt, ql, rl, None, mesh=mesh)
want = [float(calc_map_k(q, r, ql, rl, None))
        for q, r in ((qi, rt), (qt, ri), (qi, ri), (qt, rt))]
map_err = max(abs(g - w) for g, w in zip(got, want))

from cmh_tpu.ops.hashing import pack_bits
from cmh_tpu.serving import RetrievalIndex, _search_sharded

idx = RetrievalIndex(bits)
idx.add(ri)
d1, i1 = idx.search(qi[:8], topk=17)          # single-device Pallas path
qp = pack_bits(jnp.asarray(qi[:8]))
gp = jnp.asarray(np.concatenate(idx._chunks, axis=0))
dm, im = _search_sharded(qp, gp, 17, mesh, 1024, interpret=False)
serving_equal = bool((np.asarray(dm) == d1).all()
                     and (np.asarray(im) == i1).all())
print(f"shard-smoke ok map_err={map_err:.2e} "
      f"serving_equal={serving_equal} maps={[round(g,6) for g in got]}")
assert map_err < 1e-5 and serving_equal
PYEOF
tail -1 /tmp/batt_shard.log >> "$STATUS"
mkdir -p tools/artifacts/battery
cp /tmp/batt_shard.log tools/artifacts/battery/shard_map_smoke.log
echo "=== stage5 done $(date)" >> "$STATUS"
