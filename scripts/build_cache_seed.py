"""Build the shipped XLA compile-cache seed (xla_cache_seed/).

Run AFTER a full `python bench.py` on the target hardware with the final
code state: copies every entry of the active persistent cache into
xla_cache_seed/ with a MANIFEST.json recording the jax/jaxlib versions
(seeding is version-gated — see utils/jaxcache.seed_cache_dir).  A fresh
container then serves the bench/CLI model-step compiles (~60 s each with
the 32 MB scoped-VMEM budget) from the repo instead of re-paying them.

Usage: python scripts/build_cache_seed.py [cache_dir]
"""

import json
import os
import shutil
import sys


def main():
    cache = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.expanduser("~"), ".cache", "jax_comp_cache")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seed = os.path.join(repo, "xla_cache_seed")
    os.makedirs(seed, exist_ok=True)

    import jax
    import jaxlib

    n = 0
    total = 0
    for name in os.listdir(cache):
        if not name.endswith("-cache"):
            continue
        src = os.path.join(cache, name)
        dst = os.path.join(seed, name)
        if not os.path.exists(dst) or (
                os.path.getmtime(src) > os.path.getmtime(dst)):
            shutil.copyfile(src, dst)
            n += 1
        total += os.path.getsize(src)
    with open(os.path.join(seed, "MANIFEST.json"), "w") as f:
        json.dump({"jax": jax.__version__, "jaxlib": jaxlib.__version__},
                  f, indent=1)
    print(f"seeded {n} new entries ({total / 1e6:.1f} MB total) -> {seed}")


if __name__ == "__main__":
    main()
