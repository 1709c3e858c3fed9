import time, sys
import jax, jax.numpy as jnp
import numpy as np
deadline = time.time() + 480
while time.time() < deadline:
    try:
        x = jnp.ones((128, 128)); v = float(np.asarray((x @ x).sum()))
        print("HEALTHY", v); sys.exit(0)
    except Exception as e:
        print("unhealthy:", type(e).__name__); time.sleep(20)
print("TIMEOUT"); sys.exit(1)
