"""Second round-3 TPU batch: roll-slope retry + fused general at B=128.

Run: python experiments/exp_round3b_batch.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _run(name, argv):
    import importlib

    print(json.dumps({"batch_section": name, "argv": argv}), flush=True)
    mod = importlib.import_module(name)
    old = sys.argv
    sys.argv = [name] + argv
    try:
        mod.main()
    except Exception as e:
        print(json.dumps({"batch_section": name,
                          "error": f"{type(e).__name__}: {e}"[:400]}),
              flush=True)
    finally:
        sys.argv = old


def main():
    import jax
    import jax.numpy as jnp

    y = (jnp.full((256, 256), 1.0) @ jnp.full((256, 256), 1.0)).sum()
    print(json.dumps({"warm": float(y),
                      "backend": jax.default_backend()}), flush=True)
    _run("exp_general_fused", ["--size", "16", "--degree", "4",
                               "--reps", "100"])
    _run("exp_roll_speed", [])


if __name__ == "__main__":
    main()
