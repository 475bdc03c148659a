"""Fresh-process A/B of one query under an env lever: each reading is a
new JVM (order-drift-proof). Usage: ab_env_fresh.py <query> <ENV> <valA>
<valB> <rounds> [sf_dir] [runs_per_proc]"""
import json, os, subprocess, sys

query, env, va, vb, rounds = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4], int(sys.argv[5])
sf_dir = sys.argv[6] if len(sys.argv) > 6 else "/root/testdata/sf0.1"
rpp = sys.argv[7] if len(sys.argv) > 7 else "2"

res = {va: [], vb: []}
for i in range(rounds):
    for v in (va, vb):
        e = dict(os.environ); e[env] = v
        load0 = open("/proc/loadavg").read().split()[0]
        r = subprocess.run(
            [sys.executable, ".round17/solo_one.py", query, sf_dir, rpp],
            capture_output=True, text=True, env=e, cwd="/root/repo",
        )
        best = None
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                best = json.loads(line)["min"]
        res[v].append(best)
        print(json.dumps({"round": i, env: v, "min": best, "load_pre": load0}), flush=True)
print(json.dumps({"query": query, "env": env, "summary": {
    v: {"best": min(x for x in r if x is not None), "all": r} for v, r in res.items()}}), flush=True)
