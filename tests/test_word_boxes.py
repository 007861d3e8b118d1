import numpy as np
import pytest

from oar_ocr_tpu.processors.word_boxes import word_boxes

pytestmark = pytest.mark.fast


def _identity_matrix(offset_x=0.0, offset_y=0.0):
    m = np.eye(3, dtype=np.float32)
    m[0, 2] = offset_x
    m[1, 2] = offset_y
    return m


def test_single_word_span():
    # native crop 80x16 at page offset (100, 50); tile width 240, T=30
    m = _identity_matrix(100, 50)
    out = word_boxes(m, 80, 16, 240, 30, cols=[3, 4, 5], text="abc")
    assert len(out) == 1
    word, quad = out[0]
    assert word == "abc"
    # col 3 → tile x 24 → native x 8 → page x 108
    assert quad[0, 0] == pytest.approx(108, abs=0.5)
    assert quad[0, 1] == pytest.approx(50, abs=0.5)
    assert quad[2, 1] == pytest.approx(66, abs=0.5)


def test_words_split_on_space():
    m = _identity_matrix()
    out = word_boxes(m, 100, 20, 200, 25,
                     cols=[0, 1, 3, 5, 6], text="ab cd", )
    assert [w for w, _ in out] == ["ab", "cd"]
    # second word starts after the first ends
    assert out[1][1][0, 0] > out[0][1][1, 0] - 10


def test_empty():
    assert word_boxes(_identity_matrix(), 10, 10, 10, 2, [], "") == []
