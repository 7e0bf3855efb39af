"""Package searcharray_spark for spark-submit --py-files.

    python scripts/make_pyfiles_zip.py [out.zip]   (default: dist/searcharray_spark.zip)
"""
import os
import sys
import zipfile


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "dist/searcharray_spark.zip"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "searcharray_spark")
    os.makedirs(os.path.dirname(os.path.abspath(out)) or ".", exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _, files in os.walk(pkg):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, repo))
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
