import numpy as np
import pytest

from oar_ocr_tpu.domain.structure import LayoutElementType
from oar_ocr_tpu.vl.doc_parser import (DocParser, RecognitionTask,
                                       task_for_element)

pytestmark = pytest.mark.fast


class StubBackend:
    """RecognitionBackend double: records calls, returns canned text."""

    def __init__(self):
        self.calls = []

    def recognize(self, images, task, max_tokens=None):
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


# ------- official per-backend prompt maps (doc_parser.rs:480-600) -------

class _FakeFamily:
    class cfg:
        tasks = ("ocr",)

    def __init__(self):
        self.calls = []

    def generate(self, images, task, *, max_new_tokens, prompt=None):
        self.calls.append((len(images), task, prompt))
        return ["out " + "loop" * 40] * len(images)


def test_backend_prompt_maps():
    from oar_ocr_tpu.vl.doc_parser import (GLM_TASK_PROMPTS,
                                           HUNYUAN_TASK_PROMPTS,
                                           MINERU_TASK_PROMPTS,
                                           RecognitionTask, glm_backend,
                                           hunyuan_backend, mineru_backend)
    assert GLM_TASK_PROMPTS[RecognitionTask.TABLE] == "Table Recognition:"
    assert MINERU_TASK_PROMPTS[RecognitionTask.TEXT].startswith("\n")
    assert MINERU_TASK_PROMPTS[RecognitionTask.CHART] == \
        "\nDocument Parsing:"
    assert "Mermaid" in HUNYUAN_TASK_PROMPTS[RecognitionTask.CHART]

    fam = _FakeFamily()
    be = glm_backend(fam)
    out = be.recognize([np.zeros((32, 32, 3), np.uint8)],
                       RecognitionTask.FORMULA)
    assert fam.calls[0][2] == "Formula Recognition:"
    assert out[0].count("loop") < 40          # repetition truncated

    fam2 = _FakeFamily()
    hb = hunyuan_backend(fam2)
    hb.recognize([np.zeros((32, 32, 3), np.uint8)], RecognitionTask.TEXT)
    assert fam2.calls[0][2].startswith("Detect and recognize text")


def test_mineru_backend_resizes_small_crops():
    from oar_ocr_tpu.vl.doc_parser import (RecognitionTask, mineru_backend,
                                           resize_for_mineru)
    fam = _FakeFamily()
    sizes = []
    orig = fam.generate

    def spy(images, task, **kw):
        sizes.extend(im.shape[:2] for im in images)
        return orig(images, task, **kw)

    fam.generate = spy
    be = mineru_backend(fam)
    be.recognize([np.zeros((10, 200, 3), np.uint8)], RecognitionTask.TEXT)
    assert min(sizes[0]) >= 28                 # min-edge floor applied
    # extreme aspect crop is padded before scaling
    out = resize_for_mineru(np.zeros((4, 300, 3), np.uint8))
    assert max(out.shape[:2]) / min(out.shape[:2]) <= 50.0 + 1e-6
