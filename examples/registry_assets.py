"""Registry example (examples/auto_download.rs analog): list the model
lineup with upstream provenance (downloads are environment-disabled;
conversion consumes verified upstream artifacts instead)."""

from _common import parse_args


def main():
    parse_args("Registry lineup example")
    from oar_ocr_tpu.registry.models import (ASSET_REGISTRY, MODEL_REGISTRY,
                                             upstream_provenance)

    by_task = {}
    for e in MODEL_REGISTRY.values():
        by_task.setdefault(e.task, []).append(e)
    for task in sorted(by_task):
        print(f"[{task}] ({len(by_task[task])})")
        for e in sorted(by_task[task], key=lambda x: x.name)[:4]:
            prov = upstream_provenance(e)
            sha = prov[0][:12] + "…" if prov else "hf-hub"
            print(f"  {e.name:42s} source={e.source or '-':44s} {sha}")
        if len(by_task[task]) > 4:
            print(f"  … {len(by_task[task]) - 4} more")
    print(f"assets: {len(ASSET_REGISTRY)} dictionaries/tokenizers")


if __name__ == "__main__":
    main()
