"""Same-session A/B timing helper (not part of the repo surface)."""
import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
sys.path.insert(0, "/root/repo")

from chat_data_pipeline_spark import get_spark
from chat_data_pipeline_spark.queries import REGISTRY

names = sys.argv[1].split(",")
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
spark = get_spark(app_name="ab", master="local[32]", shuffle_partitions=32)
sf = os.environ["SPARK_GRAFT_SF_DIR"]
out = {}
for name in names:
    q = REGISTRY[name]
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        q.fn(spark, sf).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    out[name] = round(best, 3)
print(json.dumps(out))
spark.stop()
