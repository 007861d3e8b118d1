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
