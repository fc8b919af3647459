#!/bin/sh
# PBS node wrapper (pbs backend of submit_substructures.py)
cd "$(dirname "$0")"
python compute_substructures.py -fp "$FILE_PATH" -estart "$ENTRY_START" -estop "$ENTRY_STOP" -sd "$SAVE_DIR"
rm "$SAVE_DIR/status/job_${ENTRY_START}_${ENTRY_STOP}.status"
