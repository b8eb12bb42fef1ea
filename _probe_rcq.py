import sys, json
from cpprcoder_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from cpprcoder_tpu.bench.device import RCQJob
from cpprcoder_tpu.bench.harness import load

name, k = sys.argv[1], int(sys.argv[2])
j = RCQJob(name, load(name), backend="pallas", lanes=k)
j.warm()
j.run()
print(json.dumps(j.finalize()), flush=True)
