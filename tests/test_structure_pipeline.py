import jax.numpy as jnp
import numpy as np
import pytest

from oar_ocr_tpu.models.detection.layout import LayoutDetector
from oar_ocr_tpu.pipelines.structure import (OARStructure, OARStructureConfig,
                                             OARStructureBuilder)


@pytest.fixture(scope="module")
def layout_only_pipeline():
    layout = LayoutDetector("picodet-s_layout_3cls", score_thresh=0.01)
    return OARStructure(layout=layout, ocr=None, tables=None,
                        formulas=None, seal_ocr=None,
                        cfg=OARStructureConfig(
                            use_tables=False, use_formulas=False,
                            use_seals=False, use_overall_ocr=False))


def test_structure_layout_only(layout_only_pipeline, rng):
    img = rng.integers(0, 255, (200, 300, 3), dtype=np.uint8)
    results = layout_only_pipeline.predict([img, img])
    assert len(results) == 2
    res = results[0]
    assert res.width == 300 and res.height == 200
    md = res.to_markdown()
    html = res.to_html()
    j = res.to_json_value()
    assert isinstance(md, str) and "<html>" in html
    assert j["width"] == 300


def test_structure_empty(layout_only_pipeline):
    assert layout_only_pipeline.predict([]) == []


def test_table_analyzer_plumbing(rng):
    from oar_ocr_tpu.models.recognition.slanet import SLANetModel
    from oar_ocr_tpu.pipelines.table_analyzer import (TableAnalyzer,
                                                      TableRegionInput)

    analyzer = TableAnalyzer(structure=SLANetModel(max_steps=8),
                             use_cell_detection=False)
    pages = jnp.asarray(rng.integers(0, 255, (1, 256, 256, 3), dtype=np.uint8))
    inp = TableRegionInput(
        page_index=0, box=(20, 20, 220, 200),
        ocr_boxes=[np.array([[30, 30], [100, 30], [100, 50], [30, 50]],
                            np.float32)],
        ocr_texts=["cell text"])
    out = analyzer.analyze_tables(pages, [inp])
    assert len(out) == 1
    tr = out[0]
    assert tr.html.startswith("<html><body><table>")
    assert tr.is_wired in (True, False)
    assert analyzer.analyze_tables(pages, []) == []


def test_builder_preprocess_flags():
    """The reference's full builder surface: doc orientation/rectification,
    textline orientation, table orientation (structure.rs:1336 builder
    methods) route into the pipeline."""
    from oar_ocr_tpu.pipelines.structure import OARStructureBuilder

    b = (OARStructureBuilder()
         .with_layout_variant("picodet-s_layout_3cls")
         .with_tables(True).with_formulas(False).with_seals(False)
         .with_doc_orientation().with_textline_orientation()
         .with_table_orientation())
    pipe = b.build()
    assert pipe.preprocessor is not None
    assert pipe.preprocessor.orientation is not None
    assert pipe.preprocessor.rectifier is None
    assert pipe.tables.orientation is not None
    assert pipe.ocr.line_orienter is not None

    import numpy as np

    img = np.full((220, 300, 3), 250, np.uint8)
    img[40:70, 30:260] = 20
    res = pipe.predict([img])
    assert len(res) == 1 and res[0].width == 300


def test_builder_table_overrides():
    """Per-kind table slots thread through the builder (structure.rs:1336
    with_wired/wireless_table_* methods)."""
    import numpy as np

    from oar_ocr_tpu.models.recognition.slanet import TableStructure
    from oar_ocr_tpu.pipelines.structure import OARStructureBuilder

    class Stub:
        def recognize(self, pages, regions, angles=None):
            return [TableStructure(tokens=[], cell_boxes=np.zeros(
                (0, 8), np.float32), score=0.0) for _ in regions]

    wired, wireless = Stub(), Stub()
    pipe = (OARStructureBuilder()
            .with_layout_variant("picodet-s_layout_3cls")
            .with_formulas(False).with_seals(False)
            .with_overall_ocr(False)
            .with_wired_table_structure(wired)
            .with_wireless_table_structure(wireless)
            .build())
    assert pipe.tables.wired_structure is wired
    assert pipe.tables.wireless_structure is wireless


def test_table_ocr_split_rerecognize(rng, monkeypatch):
    """A cross-cell OCR box is split at detection-backed cell boundaries
    and the fragments are re-recognized into per-cell regions
    (structure.rs:2666-2685 → :1630-1846). Recognition is stubbed so the
    assertion pins the split/re-pool wiring, not model output."""
    import jax.numpy as jnp

    from oar_ocr_tpu.domain.structure import TableResult
    from oar_ocr_tpu.domain.text_region import TextRegion
    from oar_ocr_tpu.pipelines.ocr import OAROCRBuilder
    from oar_ocr_tpu.pipelines.structure import OARStructure

    ocr = OAROCRBuilder("general").build()
    pipe = OARStructure(layout=None, ocr=ocr, tables=None)
    pages = jnp.zeros((1, 128, 256, 3), jnp.uint8)

    # two detection-backed cells side by side; one OCR line spans both
    table = TableResult(html="", cell_boxes=np.array(
        [[10, 10, 100, 40], [110, 10, 200, 40]], np.float32), is_e2e=False)
    spanning = TextRegion(box=np.array(
        [[12, 12], [198, 12], [198, 38], [12, 38]], np.float32),
        text="left right", confidence=0.9)
    outside = TextRegion(box=np.array(
        [[5, 60], [80, 60], [80, 80], [5, 80]], np.float32),
        text="keep", confidence=0.8)

    seen_plans = []

    def fake_rec(pages_u8, plans, host_images=None):
        seen_plans.extend(plans)
        return [(f"frag{i}", 0.5, []) for i in range(len(plans))]

    monkeypatch.setattr(ocr.recognizer, "recognize_chunk", fake_rec)
    out = pipe._split_regions_by_cells(
        pages, 0, (128, 256), [spanning, outside], [table])

    # fragments: cell0 clamp, gap, cell1 clamp → 3 crops re-recognized
    assert len(seen_plans) == 3
    texts = [r.text for r in out]
    assert "keep" in texts                      # untouched region survives
    assert sum(t.startswith("frag") for t in texts) == 3
    # fragment geometry: first fragment clamped to cell 0's x-range
    frag0 = next(r for r in out if r.text == "frag0")
    x0, y0, x1, y1 = frag0.xyxy
    assert (x0, x1) == (12.0, 100.0)
    # order: fragments replace the original in place, before 'keep'
    assert texts.index("frag0") < texts.index("keep")


def test_cell_detection_on_rotated_table():
    """Cell detection samples the table through a de-rotating matrix and
    maps boxes back (table_analyzer.rs:311 crop-first + :354-383
    orientation + :560-572 rotate_back) — a 90°-rotated table must yield
    the same cell as its upright twin, rotated. A deterministic stub
    detector (bright-region bbox) isolates the matrix plumbing from NMS
    tie-breaking on random weights."""
    import jax.numpy as jnp

    from oar_ocr_tpu.models.recognition.slanet import (SLANetModel,
                                                       rotate_boxes_back)
    from oar_ocr_tpu.pipelines.table_analyzer import (TableAnalyzer,
                                                      TableRegionInput)

    class StubDet:
        """Finds the bounding box of the bright region of its input —
        rotation-equivariance is exactly testable."""

        class variant:
            input_hw = (64, 64)

        params = None

        def _step(self, params, pages, mats, idx, sizes):
            from oar_ocr_tpu.ops.warp import NormSpec, sample_transform

            n = mats.shape[0]
            full = jnp.full((n, ), 64, jnp.int32)
            x = np.asarray(sample_transform(
                pages, mats, idx, full, full, out_h=64, out_w=64,
                norm=NormSpec.identity(), out_dtype=jnp.float32))
            sizes = np.asarray(sizes)
            boxes = np.zeros((n, 1, 4), np.float32)
            for i in range(n):
                ys, xs = np.nonzero(x[i].mean(-1) > 128)
                sy, sx = sizes[i][0] / 64.0, sizes[i][1] / 64.0
                boxes[i, 0] = [xs.min() * sx, ys.min() * sy,
                               (xs.max() + 1) * sx, (ys.max() + 1) * sy]
            return (jnp.asarray(boxes), jnp.ones((n, 1), jnp.float32),
                    jnp.zeros((n, 1), jnp.int32), jnp.ones((n, 1), bool))

    analyzer = TableAnalyzer(structure=SLANetModel(max_steps=4),
                             cell_detector=StubDet())

    upright = np.zeros((100, 60, 3), np.uint8)
    upright[10:30, 5:25] = 255                # bright cell
    original = np.rot90(upright, -1).copy()   # rot90(original, 1) == upright
    pages = np.zeros((2, 128, 128, 3), np.uint8)
    pages[0, 8:108, 8:68] = upright
    pages[1, 8:68, 8:108] = original
    tables = [
        TableRegionInput(page_index=0, box=(8.0, 8.0, 68.0, 108.0)),
        TableRegionInput(page_index=1, box=(8.0, 8.0, 108.0, 68.0)),
    ]
    b0, b1 = analyzer._detect_cells(jnp.asarray(pages), tables, [0, 1],
                                    angles=[0, 90])
    assert len(b0) == len(b1) == 1
    rel0 = (b0 - 8.0).astype(np.float32)
    rel1 = (b1 - 8.0).astype(np.float32)
    # upright sees the cell at ~(5,10)-(25,30)
    np.testing.assert_allclose(rel0[0], [5, 10, 25, 30], atol=2.5)
    mapped = rotate_boxes_back(rel0, 90, 100, 60)
    pts = mapped.reshape(-1, 2, 2)
    mapped_xyxy = np.concatenate([pts.min(1), pts.max(1)], axis=1)
    np.testing.assert_allclose(mapped_xyxy, rel1, atol=1e-3)


def test_structure_single_upload(rng, monkeypatch):
    """A multi-page structure predict uploads the page batch exactly ONCE
    (VERDICT r3 item 2): overall OCR slices its det chunks from the shared
    device batch instead of re-uploading per chunk (structure.rs:2821's
    cross-page precompute sharing loaded pages)."""
    from oar_ocr_tpu.pipelines.ocr import OAROCRBuilder
    from oar_ocr_tpu.runtime.runtime import Runtime

    ocr = OAROCRBuilder("general").build()
    layout = LayoutDetector("picodet-s_layout_3cls", score_thresh=0.01)
    pipe = OARStructure(layout=layout, ocr=ocr, tables=None,
                        formulas=None, seal_ocr=None,
                        cfg=OARStructureConfig(
                            use_tables=False, use_formulas=False,
                            use_seals=False))

    calls = []
    orig = Runtime.put_pages

    def counted(self, images, hw):
        calls.append(len(images))
        return orig(self, images, hw)

    monkeypatch.setattr(Runtime, "put_pages", counted)
    img = np.full((200, 300, 3), 255, np.uint8)
    img[40:60, 30:200] = 20
    img2 = np.full((160, 240, 3), 255, np.uint8)
    img2[50:70, 20:180] = 20
    res = pipe.predict([img, img2, img])
    assert len(res) == 3
    assert calls == [3], f"expected one 3-page upload, saw {calls}"
