import os
import sys
from pathlib import Path

# Multi-chip tests run on a virtual 8-device CPU mesh; the TPU (if any) is
# exercised by bench.py, not the unit tests.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
