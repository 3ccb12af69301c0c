"""Quick oracle check for a subset of queries (throwaway helper).
Usage: python check_subset.py q18_streaming_fanout q34_streaming_sessions ...
"""
import os, sys, time
REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
SF = os.environ.get("VERIFY_SF_DIR", "/root/testdata/sf0.01")

from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[16]")
         .config("spark.sql.session.timeZone", "America/New_York")
         .config("spark.ui.showConsoleProgress", "false")
         .appName("check_subset").getOrCreate())
import __spark_entry__ as E
from tests.oracle import compare, duck_connect

sf_name = os.path.basename(os.path.normpath(SF))
duck = duck_connect(SF)
queries, oracles = E.queries(), E.oracle_sql()
fail = 0
for name in sys.argv[1:]:
    t0 = time.time()
    df = queries[name](spark, SF)
    if name in oracles:
        sql = oracles[name].replace("rudder_events_sf0.01.parquet", f"rudder_events_{sf_name}.parquet")
        ok, msg = compare(df, duck, sql)
    else:
        ok, msg = True, f"rows-only {df.count()}"
    print(f"{name}: {'OK' if ok else 'FAIL'} {str(msg)[:300]} ({time.time()-t0:.1f}s)", flush=True)
    fail += 0 if ok else 1
spark.stop()
sys.exit(1 if fail else 0)
