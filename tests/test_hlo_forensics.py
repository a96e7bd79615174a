"""Unit tests for the HLO-collective classifier behind the GSPMD-vs-ring
decision (benchmarks/hlo_pair_forensics.py, docs/DESIGN.md)."""
import importlib.util
import os

import pytest

path = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                    "hlo_pair_forensics.py")


@pytest.fixture(scope="module")
def forensics():
    # import without executing main(); the module sets JAX_PLATFORMS=cpu
    # itself which is fine under the test env
    spec = importlib.util.spec_from_file_location("hlo_pair_forensics", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestAxisClassifier:
    def test_iota_pair_groups(self, forensics):
        # [2,4]<=[8]: 2 groups of 4 consecutive ids -> pair axis (num_pair=4)
        assert forensics.axis_of("[2,4]<=[8]", 4) == "pair"

    def test_iota_transposed_data_groups(self, forensics):
        # [4,2]<=[2,4]T(1,0): groups {0,4},{1,5},... stride 4 -> data axis
        assert forensics.axis_of("[4,2]<=[2,4]T(1,0)", 4) == "data"

    def test_explicit_groups(self, forensics):
        assert forensics.axis_of("{{0,1,2,3},{4,5,6,7}}", 4) == "pair"
        assert forensics.axis_of("{{0,4},{1,5},{2,6},{3,7}}", 4) == "data"

    def test_empty_is_all(self, forensics):
        assert forensics.axis_of("", 4) == "all"

    def test_tensor_bytes(self, forensics):
        assert forensics.tensor_bytes("f32[2,32,32,16]{3,2,1,0}") \
            == 2 * 32 * 32 * 16 * 4
        assert forensics.tensor_bytes("bf16[8,48]") == 8 * 48 * 2
