import os, sys, time
sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F
from mypipe_spark.session import get_spark
from mypipe_spark.plans.similarity import (
    _spark_quantized, _assemble_by_pos, _round_mean_sql, _centroid_sums,
    _centroid_array_sql, _cos, _QUERY_VEC_ID, _IVF_NPROBE, _TOP_K, _DIMS,
    _OUTLIERS_PER_LABEL)
from mypipe_spark.plans.catalog import round4_double_sql
from pyspark.sql import Window

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("exp-ivf-ab"); spark.sparkContext.setLogLevel("ERROR")

def cent_old(n):
    cexp = (n.select("label", F.posexplode("qv").alias("i", "x"))
        .groupBy("label", "i").agg(F.sum("x").alias("s"), F.count("*").alias("c")))
    return (cexp.groupBy("label")
        .agg(F.expr(_assemble_by_pos("i", f"CAST({_round_mean_sql('s','c','div')} AS BIGINT)")).alias("cv")))

def cent_new(n):
    return _centroid_sums(n, "label", _DIMS).select(
        "label", F.expr(_centroid_array_sql(_DIMS)).alias("cv"))

def ivf(cent_fn):
    n = _spark_quantized(spark, sf_dir)
    qry = F.broadcast(_spark_quantized(spark, sf_dir, rebalance=False)
        .filter(F.col("vec_id") == _QUERY_VEC_ID)
        .select(F.col("qv").alias("qqv"), F.col("nrm2").alias("qn")))
    cent = cent_fn(n).withColumn("cn2",
        F.expr("aggregate(cv, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)"))
    probed = (cent.crossJoin(qry).withColumn("csim", _cos("cv","cn2","qqv","qn"))
        .orderBy(F.desc("csim"), "label").limit(_IVF_NPROBE).select("label"))
    return (n.join(F.broadcast(probed), "label")
        .filter(F.col("vec_id") != _QUERY_VEC_ID).crossJoin(qry)
        .withColumn("cos_raw", _cos("qv","nrm2","qqv","qn"))
        .orderBy(F.desc("cos_raw"), "vec_id").limit(_TOP_K)
        .select("vec_id","label", F.expr(round4_double_sql("cos_raw")).alias("cosine")))

def outliers(cent_fn):
    n = _spark_quantized(spark, sf_dir).filter(F.col("qv").isNotNull())
    cent = cent_fn(n)
    d = n.join(F.broadcast(cent), "label").select("vec_id","label",
        F.expr("aggregate(zip_with(qv, cv, (x, c) -> (x - c) * (x - c)),"
               " CAST(0 AS BIGINT), (acc, y) -> acc + y)").alias("dist2"))
    w = Window.partitionBy("label").orderBy(F.desc("dist2"), "vec_id")
    return (d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _OUTLIERS_PER_LABEL)
        .select("label", F.col("rk").cast("int").alias("rk"), "vec_id", "dist2"))

dfs = {"ivf_old": ivf(cent_old), "ivf_new": ivf(cent_new),
       "out_old": outliers(cent_old), "out_new": outliers(cent_new)}
t = {k: [] for k in dfs}
rounds = int(os.environ.get("EXP_ROUNDS", "7"))
for _ in range(rounds):
    for name, df in dfs.items():
        spark.sparkContext.setJobDescription(f"exp_ivf_ab:{name}")
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t[name].append(round(time.perf_counter() - t0, 3))
for name in dfs:
    runs = t[name]
    print(f"{name:8s} min={min(runs):6.3f} med={sorted(runs)[len(runs)//2]:6.3f} {runs}")
ok1 = sorted(map(tuple, dfs["ivf_old"].collect())) == sorted(map(tuple, dfs["ivf_new"].collect()))
ok2 = sorted(map(tuple, dfs["out_old"].collect())) == sorted(map(tuple, dfs["out_new"].collect()))
print("ivf identical:", ok1, " outliers identical:", ok2)
