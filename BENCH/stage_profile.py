import sys, time, json, os, glob
sys.path.insert(0, "/root/repo")
CPUS = int(sys.argv[1])
evdir = f"/tmp/dqcs_evlog_{CPUS}"
os.makedirs(evdir, exist_ok=True)
import shutil
for f in glob.glob(evdir + "/*"): shutil.rmtree(f, ignore_errors=True) if os.path.isdir(f) else os.remove(f)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master(f"local[{CPUS}]")
         .config("spark.sql.shuffle.partitions", str(max(CPUS,8)))
         .config("spark.sql.execution.arrow.pyspark.enabled","true")
         .config("spark.eventLog.enabled","true")
         .config("spark.eventLog.dir", evdir).config("spark.eventLog.compress","false")
         .config("spark.driver.memory","24g")
         .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from data_quality_check_spark.plans import pipeline
from data_quality_check_spark.functions.udfs import broadcast_models
bc = broadcast_models(spark)
def run():
    df = spark.read.parquet("/tmp/dqcs_bench/sf0.1_turns4000000")
    lab = pipeline.label_turns(df, with_models=True, bc_models=bc)
    pipeline.stable_order(lab, 32).write.mode("overwrite").parquet(f"/tmp/dqcs_bench/out_ev_{CPUS}")
run()  # warmup
t0=time.time(); run(); wall = time.time()-t0
spark.stop()
# parse event log: per-stage task time, only for the second run (take last N stages)
stages = {}
for path in [p for p in glob.glob(evdir + "/**", recursive=True) if os.path.isfile(p) and "appstatus" not in p]:
    for line in open(path):
        try: e = json.loads(line)
        except: continue
        if e.get("Event") == "SparkListenerTaskEnd":
            sid = e["Stage ID"]
            ti = e["Task Info"]
            dur = ti["Finish Time"] - ti["Launch Time"]
            m = e.get("Task Metrics") or {}
            stages.setdefault(sid, dict(n=0, dur=0, gc=0, cpu=0, des=0))
            s = stages[sid]
            s["n"] += 1; s["dur"] += dur
            s["gc"] += m.get("JVM GC Time", 0)
            s["cpu"] += m.get("Executor CPU Time", 0)//1_000_000
        elif e.get("Event") == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            stages.setdefault(si["Stage ID"], {}).update(
                name=si["Stage Name"].split()[0],
                sub=si["Submission Time"], done=si["Completion Time"])
print(f"WALL {wall:.1f}s  cpus={CPUS}")
for sid in sorted(stages):
    s = stages[sid]
    if "sub" not in s or s.get("n",0)==0: continue
    span = (s["done"]-s["sub"])/1000
    print(f"stage {sid:3d} {s.get('name','?'):18s} tasks={s['n']:3d} span={span:6.1f}s taskdur={s['dur']/1000:7.1f}s cpu={s['cpu']/1000:7.1f}s gc={s['gc']/1000:5.1f}s")
