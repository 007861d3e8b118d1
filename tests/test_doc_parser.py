import numpy as np
import pytest

from oar_ocr_tpu.domain.structure import LayoutElementType
from oar_ocr_tpu.vl.doc_parser import (DocParser, RecognitionTask,
                                       task_for_element)


class StubBackend:
    """RecognitionBackend double: records calls, returns canned text."""

    def __init__(self):
        self.calls = []

    def recognize(self, images, task):
        self.calls.append((task, len(images)))
        if task == RecognitionTask.TABLE:
            return ["<fcel>A<fcel>B<nl><fcel>C<ecel><nl>"] * len(images)
        if task == RecognitionTask.FORMULA:
            return ["x^2 + y^2"] * len(images)
        return [f"text-{i}" for i in range(len(images))]


def test_task_mapping():
    assert task_for_element(LayoutElementType.TEXT) == RecognitionTask.TEXT
    assert task_for_element(LayoutElementType.TABLE) == RecognitionTask.TABLE
    assert task_for_element(
        LayoutElementType.DISPLAY_FORMULA) == RecognitionTask.FORMULA
    assert task_for_element(LayoutElementType.SEAL) == RecognitionTask.SEAL
    assert task_for_element(LayoutElementType.IMAGE) is None


@pytest.fixture(scope="module")
def parser_and_backend():
    from oar_ocr_tpu.models.detection.layout import LayoutDetector

    backend = StubBackend()
    parser = DocParser(backend, layout=LayoutDetector(
        "picodet-s_layout_3cls", score_thresh=0.01))
    return parser, backend


def test_parse_batches_by_task(parser_and_backend, rng):
    parser, backend = parser_and_backend
    img = rng.integers(0, 255, (200, 260, 3), dtype=np.uint8)
    res = parser.parse(img)
    assert res.width == 260 and res.height == 200
    # each recognized task was one BATCHED backend call
    tasks_called = [t for t, _ in backend.calls]
    assert len(tasks_called) == len(set(tasks_called))
    # OTSL table outputs were converted to HTML
    for el in res.elements:
        if el.table is not None:
            assert el.table.html.startswith("<table>")
            assert "<td>A</td>" in el.table.html
    md = parser.parse_to_markdown(img)
    assert isinstance(md, str)
