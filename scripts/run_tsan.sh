#!/bin/sh
# TSAN job for the threaded C++ host pipeline (SURVEY.md §5.2).
# Exit 0 = clean; any data race makes tsan abort with exit 66.
set -e
cd "$(dirname "$0")/.."
g++ -fsanitize=thread -O1 -g -std=c++17 scripts/tsan_hostio.cpp \
    -o /tmp/tsan_hostio -lpthread
TSAN_OPTIONS="halt_on_error=1 exitcode=66" /tmp/tsan_hostio
echo "TSAN: clean"
