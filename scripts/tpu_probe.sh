#!/bin/sh
# Cheap TPU-relay liveness probe: checks the axon relay ports without ever
# creating a PJRT client (so it cannot wedge the tunnel). rc 0 = relay up.
python - <<'PY'
import socket, sys
for port in (8082, 8083, 8087):
    s = socket.socket(); s.settimeout(2)
    try:
        s.connect(("127.0.0.1", port)); s.close()
        print(f"relay port {port}: OPEN"); sys.exit(0)
    except OSError as e:
        print(f"relay port {port}: {e}")
    finally:
        s.close()
sys.exit(1)
PY
