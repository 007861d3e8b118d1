"""PDF OCR example (examples/ocr.rs --pdf path, utils/pdf.rs): rasterize
pages (backend-dispatched) and OCR each."""

from _common import out_path, parse_args


def main():
    args = parse_args("PDF OCR example",
                      pdf=dict(required=False, help="input PDF path"))
    from oar_ocr_tpu.pipelines.ocr import OAROCRBuilder
    from oar_ocr_tpu.utils.pdf import available_backend, render_pdf

    if not args.pdf:
        print("usage: pdf_ocr.py --pdf doc.pdf; rasterizer backend "
              f"available here: {available_backend() or 'none'}")
        return
    pages = render_pdf(args.pdf, dpi=150)
    print(f"{len(pages)} pages")
    pipe = OAROCRBuilder("general").build()
    results = pipe.predict(pages)
    for i, res in enumerate(results):
        print(f"page {i}: {len(res.regions)} regions")
        with open(out_path(args, f"page_{i}.txt"), "w") as f:
            f.write("\n".join(r.text or "" for r in res.regions))


if __name__ == "__main__":
    main()
