"""Formula recognition example (examples/formula_recognition.rs):
PP-FormulaNet image -> LaTeX tokens."""

from _common import load_image, make_text_line, parse_args


def main():
    args = parse_args("Formula recognition example")
    from oar_ocr_tpu.models.recognition.formula import FormulaRecognizer

    img = load_image(args, maker=lambda: make_text_line(256))
    rec = FormulaRecognizer(max_len=32)
    res = rec.recognize([img])[0]
    print(f"latex: {res.latex[:120]!r} score={res.score:.3f}")


if __name__ == "__main__":
    main()
