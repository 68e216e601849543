"""kfunc + errmod tests (reference test/test_kfunc.c expected values)."""
import math

import numpy as np
import pytest

from htslib_tpu.errmod import Errmod
from htslib_tpu.kfunc import (kf_betai, kf_erfc, kf_gammap, kf_gammaq,
                              kf_lgamma, kt_fisher_exact)

# (n11, n12, n21, n22, left, right, two) from test_kfunc.c:61-81
FISHER_CASES = [
    (2, 1, 0, 31, 1.0, 0.005347593583, 0.005347593583),
    (2, 1, 0, 1, 1.0, 0.5, 1.0),
    (3, 1, 0, 0, 1.0, 1.0, 1.0),
    (3, 15, 37, 45, 0.021479750169, 0.995659202564, 0.033161943699),
    (12, 5, 29, 2, 0.044554737835, 0.994525206022, 0.080268552074),
    (781, 23171, 4963, 2455001, 1.0, 0.0, 0.0),
    (333, 381, 801722, 7664285, 1.0, 0.0, 0.0),
    (4155, 4903, 805463, 8507517, 1.0, 0.0, 0.0),
    (1, 1, 100000, 1000000, 0.991735477166, 0.173555146661, 0.173555146661),
    (1000, 1000, 100000, 1000000, 1.0, 0.0, 0.0),
    (1000, 1000, 1000000, 100000, 0.0, 1.0, 0.0),
    (49999, 10001, 90001, 49999, 1.0, 0.0, 0.0),
    (10000, 50000, 130000, 10000, 0.0, 1.0, 0.0),
]


@pytest.mark.parametrize("n11,n12,n21,n22,left,right,two", FISHER_CASES)
def test_fisher_exact(n11, n12, n21, n22, left, right, two):
    _, l, r, t = kt_fisher_exact(n11, n12, n21, n22)
    assert l == pytest.approx(left, abs=1e-9)
    assert r == pytest.approx(right, abs=1e-9)
    assert t == pytest.approx(two, abs=1e-9)


def test_lgamma_erfc():
    for z in [0.5, 1.0, 2.5, 10.0, 100.0]:
        assert kf_lgamma(z) == pytest.approx(math.lgamma(z), rel=1e-10)
    for x in [-3.0, -1.0, 0.0, 0.5, 1.0, 2.0, 5.0]:
        assert kf_erfc(x) == pytest.approx(math.erfc(x), rel=1e-6)


def test_gamma_beta():
    # kf_gammap(s,z) + kf_gammaq(s,z) == 1
    for s, z in [(1.0, 0.5), (3.0, 5.5), (10.0, 3.0), (0.5, 0.5)]:
        assert kf_gammap(s, z) + kf_gammaq(s, z) == pytest.approx(1.0, abs=1e-12)
    # beta(2,2,0.5) regularized == 0.5 by symmetry
    assert kf_betai(2, 2, 0.5) == pytest.approx(0.5, abs=1e-12)
    assert kf_betai(2, 3, 0.0) == 0.0
    assert kf_betai(2, 3, 1.0) == 1.0


def test_errmod_basic():
    em = Errmod(0.17)
    # all bases agree, high qual: hom likelihood for that allele ~0
    bases = [(30 << 5) | (0 << 4) | 0] * 10  # base A, strand 0, Q30
    q = em.cal(4, bases)
    assert q[0, 0] == 0.0
    assert q[1, 1] > 100  # strongly disfavored
    assert q[0, 1] > 0  # het beats wrong hom but worse than right hom
    # mixed bases favor het
    bases = ([(30 << 5) | 0] * 5) + ([(30 << 5) | 1] * 5)
    q2 = em.cal(4, bases)
    assert q2[0, 1] < q2[0, 0] and q2[0, 1] < q2[1, 1]
