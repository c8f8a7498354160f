"""Probe Mosaic features, then retry the fused general kernel (one client)."""
import json, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    import jax, jax.numpy as jnp
    y = (jnp.full((128, 128), 1.0) @ jnp.full((128, 128), 1.0)).sum()
    print(json.dumps({"warm": float(y)}), flush=True)
    import exp_mosaic_probe
    exp_mosaic_probe.main()
    print(json.dumps({"batch_section": "exp_general_fused retry"}), flush=True)
    import exp_general_fused
    old = sys.argv
    sys.argv = ["exp_general_fused", "--size", "16", "--degree", "4", "--reps", "100"]
    try:
        exp_general_fused.main()
    except Exception as e:
        print(json.dumps({"error": f"{type(e).__name__}: {e}"[:600]}), flush=True)
    finally:
        sys.argv = old

if __name__ == "__main__":
    main()
