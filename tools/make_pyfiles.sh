#!/bin/sh
# Build the spark-submit --py-files artifact.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/fujishadergpu_spark.zip
zip -qr dist/fujishadergpu_spark.zip fujishadergpu_spark -x '*__pycache__*'
cat > dist/cli_main.py <<'EOF'
# thin spark-submit driver file: the package itself ships via --py-files
from fujishadergpu_spark.cli import main
import sys
sys.exit(main())
EOF
echo "built dist/fujishadergpu_spark.zip + dist/cli_main.py"
echo "run: spark-submit --py-files dist/fujishadergpu_spark.zip dist/cli_main.py pipeline --pages <in> --out <out>"
