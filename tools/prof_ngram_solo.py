"""Solo re-measure of ngram_containment_pairs_capped (VERDICT r10 #7)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from btrdb_spark.session import get_spark
import __spark_entry__ as E

spark = get_spark("prof_ngram", cpus=32)
spark.sparkContext.setLogLevel("ERROR")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
q = E.queries()["ngram_containment_pairs_capped"]
# warm-up
q(spark, sf).count()
for rep in range(4):
    t0 = time.time()
    q(spark, sf).count()
    print(f"rep{rep}: {time.time()-t0:.2f}s", flush=True)
spark.stop()
