#!/bin/bash
# chunked full CI matrix, complex half: one process per mode to bound memory
LOG=/tmp/ci_full_complex.log
: > $LOG
for ns in 8 9 10 11 12 13 14 15 16; do
  OZ_CI_FULL=1 nice -n 10 python -m pytest \
    "tests/test_ci_matrix.py::test_ci_full_matrix" \
    -k "True- and fp64_int8_${ns}]" -q --no-header -p no:cacheprovider 2>&1 \
    | tail -1 | sed "s/^/kind=True ns=${ns}: /" >> $LOG
done
echo DONE >> $LOG
