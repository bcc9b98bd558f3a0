import os

# Tests run on CPU (fast compiles; the real-TPU path is exercised by
# bench.py and __graft_entry__). The image's sitecustomize imports jax and
# pins JAX_PLATFORMS=axon before this file runs, so the env var is already
# consumed — override through jax.config instead, and request a virtual
# 8-device CPU platform so sharding logic is exercised without hardware.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import numpy as np
import pytest

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def hapmap_geno():
    from hibag_tpu.io.rdata import read_rdata, r_to_py
    from hibag_tpu.data.geno import SNPGenoData
    d = read_rdata(str(REFERENCE / "data/HapMap_CEU_Geno.rdata"))
    return SNPGenoData.from_hibag_r(r_to_py(d["HapMap_CEU_Geno"]))


@pytest.fixture(scope="session")
def hla_types():
    from hibag_tpu.io.rdata import read_rdata, r_to_py
    d = read_rdata(str(REFERENCE / "data/HLA_Type_Table.rdata"))
    return r_to_py(d["HLA_Type_Table"])


@pytest.fixture(scope="session")
def model_list():
    from hibag_tpu.io.rdata import read_rdata, r_to_py
    d = read_rdata(str(REFERENCE / "inst/extdata/ModelList.RData"))
    return r_to_py(d["modellist"])
