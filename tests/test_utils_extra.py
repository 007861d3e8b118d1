import numpy as np
import pytest

from oar_ocr_tpu.domain.layout import LayoutBox
from oar_ocr_tpu.processors.layout_postprocess import (
    apply_nms_with_merge, best_containing_layout_index, remove_overlapping_boxes,
    unclip_boxes)
from oar_ocr_tpu.utils.image import (BatchLoadPolicy, crop_bounding_box,
                                     load_image, load_images, mask_regions,
                                     resize_and_pad)


pytestmark = pytest.mark.fast


def _lb(label, score, box):
    return LayoutBox(label=label, score=score, box=np.array(box, np.float32))


class TestLayoutPost:
    def test_unclip(self):
        b = _lb("text", 0.9, [10, 10, 30, 20])
        unclip_boxes([b], 1.5, 1.0, page_w=35, page_h=100)
        assert b.box[0] == pytest.approx(5.0)
        assert b.box[2] == pytest.approx(35.0)  # clamped

    def test_nms_merge_unions(self):
        boxes = [_lb("t", 0.9, [0, 0, 10, 10]),
                 _lb("t", 0.5, [2, 2, 14, 12]),
                 _lb("t", 0.4, [50, 50, 60, 60])]
        out = apply_nms_with_merge(boxes, iou_thresh=0.3)
        assert len(out) == 2
        merged = out[0]
        np.testing.assert_allclose(merged.box, [0, 0, 14, 12])

    def test_nms_merge_respects_class(self):
        boxes = [_lb("a", 0.9, [0, 0, 10, 10]),
                 _lb("b", 0.8, [1, 1, 11, 11])]
        out = apply_nms_with_merge(boxes, iou_thresh=0.3)
        assert len(out) == 2

    def test_nms_merge_preserves_input_order_and_caps(self):
        """Kept results come back sorted by each merged group's EARLIEST
        original index (layout_postprocess.rs:811-830 — preserves the
        PP-DocLayoutV2 pointer reading order), with max_detections
        applied by score FIRST."""
        boxes = [_lb("t", 0.4, [50, 50, 60, 60]),     # idx 0, low score
                 _lb("t", 0.9, [0, 0, 10, 10]),       # idx 1, top score
                 _lb("t", 0.5, [2, 2, 14, 12])]       # idx 2, merges → 1
        out = apply_nms_with_merge(boxes, iou_thresh=0.3)
        # input order: idx 0's box first, then the merged group (min 1)
        assert [tuple(b.box[:2]) for b in out] == [(50.0, 50.0),
                                                   (0.0, 0.0)]
        capped = apply_nms_with_merge(boxes, iou_thresh=0.3,
                                      max_detections=1)
        # cap keeps the TOP-SCORING group (the merged one), not idx 0
        assert len(capped) == 1
        np.testing.assert_allclose(capped[0].box, [0, 0, 14, 12])

    def test_associate(self):
        layout = [_lb("text", 0.9, [0, 0, 100, 50]),
                  _lb("text", 0.9, [0, 60, 100, 120])]
        ocr = [np.array([[10, 70], [90, 70], [90, 100], [10, 100]], np.float32),
               np.array([[10, 5], [50, 5], [50, 40], [10, 40]], np.float32),
               np.array([[300, 300], [310, 300], [310, 310], [300, 310]],
                        np.float32)]
        out = best_containing_layout_index(ocr, layout)
        assert out == [1, 0, None]

    def test_remove_overlapping(self):
        boxes = [_lb("a", 0.9, [0, 0, 100, 100]),
                 _lb("b", 0.5, [10, 10, 20, 20])]
        out = remove_overlapping_boxes(boxes)
        assert len(out) == 1 and out[0].label == "a"


class TestImageUtils:
    def test_resize_and_pad(self, rng):
        img = rng.integers(0, 255, (50, 100, 3), dtype=np.uint8)
        out, scale = resize_and_pad(img, 64, 64)
        assert out.shape == (64, 64, 3)
        assert scale == pytest.approx(0.64)
        assert out[40:].max() == 0  # bottom padding

    def test_mask_regions(self, rng):
        img = np.zeros((20, 20, 3), np.uint8)
        box = np.array([[5, 5], [15, 5], [15, 15], [5, 15]], np.float32)
        out = mask_regions(img, [box], value=255)
        assert out[10, 10, 0] == 255 and out[0, 0, 0] == 0

    def test_crop_bounding_box(self, rng):
        img = rng.integers(0, 255, (30, 40, 3), dtype=np.uint8)
        crop = crop_bounding_box(img, 5.2, 3.7, 15.1, 10.0)
        assert crop.shape == (7, 11, 3)

    def test_load_image_missing(self, tmp_path):
        from oar_ocr_tpu.errors import ImageLoadError

        with pytest.raises(ImageLoadError):
            load_image(str(tmp_path / "nope.png"))
        imgs, ok = load_images([str(tmp_path / "nope.png")],
                               BatchLoadPolicy.SKIP_ERRORS)
        assert imgs == [] and ok == []

    def test_load_roundtrip(self, tmp_path, rng):
        import cv2

        img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
        p = str(tmp_path / "x.png")
        cv2.imwrite(p, img[:, :, ::-1])
        loaded = load_image(p)
        np.testing.assert_array_equal(loaded, img)


class TestEdgeProcessors:
    def test_cropping_processor(self, rng):
        from oar_ocr_tpu.pipelines.processors import TextCroppingProcessor

        img = rng.integers(0, 255, (100, 100, 3), dtype=np.uint8)
        quad = np.array([[10, 10], [60, 10], [60, 30], [10, 30]], np.float32)
        crops = TextCroppingProcessor().process(img, [quad])
        assert crops[0].shape == (20, 50, 3)
        tall = np.array([[10, 10], [25, 10], [25, 70], [10, 70]], np.float32)
        crop = TextCroppingProcessor().process(img, [tall])[0]
        assert crop.shape[1] > crop.shape[0]  # rotated to horizontal

    def test_chain(self):
        from oar_ocr_tpu.pipelines.processors import (ChainProcessor,
                                                      ImageRotationProcessor)

        img = np.zeros((10, 20, 3), np.uint8)
        chain = ChainProcessor(ImageRotationProcessor(90).process,
                               ImageRotationProcessor(270).process)
        assert chain.process(img).shape == img.shape


def test_cli_parser():
    from oar_ocr_tpu.cli import build_parser

    ap = build_parser()
    args = ap.parse_args(["ocr", "x.png", "--text-type", "table"])
    assert args.text_type == "table"
    args = ap.parse_args(["structure", "y.png", "--format", "html"])
    assert args.format == "html"
    args = ap.parse_args(["vl", "z.png", "--task", "table", "--dev-tiny"])
    assert args.dev_tiny


def test_topk():
    from oar_ocr_tpu.utils.topk import topk

    probs = np.array([[0.1, 0.6, 0.3]], np.float32)
    [res] = topk(probs, k=2, labels=["a", "b", "c"])
    assert res.indices == (1, 2)
    assert res.labels == ("b", "c")
    assert res.scores[0] == pytest.approx(0.6)


def test_unimernet_preprocess(rng):
    from oar_ocr_tpu.models.recognition.formula import unimernet_preprocess

    img = np.full((50, 300, 3), 255, np.uint8)
    img[20:30, 40:260] = 10
    out = unimernet_preprocess(img)
    assert out.shape[0] % 32 == 0 and out.shape[1] % 32 == 0
    assert out.dtype == np.uint8


class TestBuiltinScannedPdf:
    """The built-in scanned-PDF extractor (the hayro fallback,
    examples/utils/pdf.rs:8-81): one embedded JPEG per page, decoded in
    document order."""

    @staticmethod
    def _make_scanned_pdf(path, imgs):
        import io

        import cv2

        objs = [b"<< /Type /Catalog /Pages 2 0 R >>"]
        kids = " ".join(f"{3 + i*3} 0 R" for i in range(len(imgs)))
        objs.append(
            f"<< /Type /Pages /Kids [{kids}] /Count {len(imgs)} >>".encode())
        for i, img in enumerate(imgs):
            h, w = img.shape[:2]
            _, enc = cv2.imencode(".jpg", img[:, :, ::-1])
            jpg = enc.tobytes()
            img_num, cont_num = 4 + i * 3, 5 + i * 3
            objs.append((
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {w} {h}] "
                f"/Resources << /XObject << /Im0 {img_num} 0 R >> >> "
                f"/Contents {cont_num} 0 R >>").encode())
            objs.append((
                f"<< /Type /XObject /Subtype /Image /Width {w} "
                f"/Height {h} /ColorSpace /DeviceRGB /BitsPerComponent 8 "
                f"/Filter /DCTDecode /Length {len(jpg)} >>").encode()
                + b"\nstream\n" + jpg + b"\nendstream")
            content = f"q {w} 0 0 {h} 0 0 cm /Im0 Do Q".encode()
            objs.append(f"<< /Length {len(content)} >>".encode()
                        + b"\nstream\n" + content + b"\nendstream")
        out = io.BytesIO()
        out.write(b"%PDF-1.4\n")
        offsets = []
        for num, obj in enumerate(objs, start=1):
            offsets.append(out.tell())
            out.write(f"{num} 0 obj\n".encode())
            out.write(obj)
            out.write(b"\nendobj\n")
        xref = out.tell()
        out.write(f"xref\n0 {len(objs)+1}\n0000000000 65535 f \n".encode())
        for off in offsets:
            out.write(f"{off:010d} 00000 n \n".encode())
        out.write(f"trailer\n<< /Size {len(objs)+1} /Root 1 0 R >>\n"
                  f"startxref\n{xref}\n%%EOF".encode())
        open(path, "wb").write(out.getvalue())

    def test_extract_pages(self, tmp_path):
        from oar_ocr_tpu.utils.pdf import render_pdf

        imgs = [np.full((64, 48, 3), 255, np.uint8),
                np.full((80, 60, 3), 200, np.uint8)]
        imgs[0][10:30, 5:40] = 20
        path = str(tmp_path / "scan.pdf")
        self._make_scanned_pdf(path, imgs)
        pages = render_pdf(path)
        assert [p.shape for p in pages] == [(64, 48, 3), (80, 60, 3)]
        assert pages[0][20, 20].mean() < 100 < pages[0][5, 5].mean()
        only = render_pdf(path, pages=[1])
        assert len(only) == 1 and only[0].shape == (80, 60, 3)

    def test_vector_pdf_raises(self, tmp_path):
        from oar_ocr_tpu.errors import UnsupportedError
        from oar_ocr_tpu.utils.pdf import extract_scanned_pages

        path = str(tmp_path / "vec.pdf")
        open(path, "wb").write(
            b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog >>\nendobj\n%%EOF")
        with pytest.raises(UnsupportedError):
            extract_scanned_pages(path)
