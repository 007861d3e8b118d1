"""DocParser example (oar-ocr-vl/examples/doc_parser.rs): layout-gated
per-region VLM parsing into a StructureResult."""

from _common import load_image, parse_args


def main():
    args = parse_args("DocParser example")
    from oar_ocr_tpu.models.detection.layout import LayoutDetector
    from oar_ocr_tpu.vl.doc_parser import DocParser, VLMBackend
    from oar_ocr_tpu.vl.model import PaddleOCRVL
    from oar_ocr_tpu.vl.paddleocr_vl import PaddleOCRVLConfig

    img = load_image(args)
    backend = VLMBackend(PaddleOCRVL(cfg=PaddleOCRVLConfig().tiny()))
    parser = DocParser(backend, layout=LayoutDetector(
        "picodet-s_layout_3cls", score_thresh=0.05))
    result = parser.parse(img)
    print(f"{len(result.elements)} elements")
    # the VL markdown exporter with per-type formatting (utils.rs:474)
    from oar_ocr_tpu.vl.text_format import to_markdown, to_markdown_openocr

    print(to_markdown(result.elements)[:400])
    print("--- openocr/paddlex mode ---")
    print(to_markdown_openocr(result.elements)[:400])


if __name__ == "__main__":
    main()
