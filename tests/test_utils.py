"""Light unit tests: mode parsing, CULiP log format, env-configured handle."""

import io
import sys

import numpy as np
import pytest

import ozimmu_tpu as oz
from ozimmu_tpu.types import ComputeMode
from ozimmu_tpu.utils.profiling import culip_timer


class TestComputeModeParse:
    def test_roundtrip_all(self):
        for ns in range(3, 19):
            m = ComputeMode.parse(f"fp64_int8_{ns}")
            assert m.is_int8 and m.num_split == ns
            assert ComputeMode.parse(m) is m
        assert ComputeMode.parse("dgemm") is ComputeMode.DGEMM
        assert ComputeMode.parse("sgemm") is ComputeMode.SGEMM
        assert ComputeMode.parse("fp64_int8_auto") is ComputeMode.FP64_INT8_AUTO

    def test_invalid_rejected(self):
        with pytest.raises(ValueError):
            ComputeMode.parse("fp64_int8_19")
        with pytest.raises(ValueError):
            ComputeMode.parse("bogus")


class TestCulip:
    def test_log_line_format(self, monkeypatch, capsys):
        monkeypatch.setenv("OZIMMU_ENABLE_CULIP_PROFILING", "1")
        with culip_timer("cublasDgemm_v2-NN-m1024-n1024-k1024"):
            pass
        out = capsys.readouterr().out
        assert out.startswith("[CULiP Result][cublasDgemm_v2-NN-m1024-n1024-k1024] ")
        assert out.strip().endswith("[ns]")

    def test_disabled_silent(self, monkeypatch, capsys):
        monkeypatch.delenv("OZIMMU_ENABLE_CULIP_PROFILING", raising=False)
        with culip_timer("x"):
            pass
        assert capsys.readouterr().out == ""


class TestHandleEnv:
    def test_thresholds_from_env(self, monkeypatch):
        monkeypatch.setenv("OZIMMU_INTERCEPT_THRESHOLD_M", "7")
        monkeypatch.setenv("OZIMMU_INTERCEPT_THRESHOLD_N", "11")
        monkeypatch.setenv("OZIMMU_INTERCEPT_THRESHOLD_K", "13")
        h = oz.create()
        assert (h.intercept_threshold_m, h.intercept_threshold_n,
                h.intercept_threshold_k) == (7, 11, 13)
        oz.destroy(h)

    def test_auto_threshold_env(self, monkeypatch):
        monkeypatch.setenv("OZIMMU_AUTO_AVG_MANTISSA_LOSS_THRESHOLD", "2.5")
        h = oz.create()
        assert h.avg_mantissa_loss_threshold == 2.5

    def test_warmup_compiles(self):
        # AOT warm-up parity (reallocate_working_memory semantics)
        h = oz.create()
        n = oz.reallocate_working_memory(
            h, [("N", "N", 32, 32, 32, "real", "fp64_int8_8")]
        )
        assert n >= 0
