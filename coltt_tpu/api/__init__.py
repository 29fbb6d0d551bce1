"""Service layer (L4): gRPC servers + clients for the three engine modes.

Reference parity: ``root_layer/`` — one gRPC surface per mode (root/
edge-lite/experimentalLayer), keepalive + max-message-size options, optional
TLS, chained panic-recovery and request-logging interceptors
(root_layer/root/rpc.go:41-137), and 1:1 RPC->engine forwarding shims
(root_layer/root/core.rpc.go:27-88).

Generated protobuf modules live in ``coltt_tpu/api/gen`` (protoc output,
committed); the service/stub bindings are hand-written in server.py /
client.py since only message codegen is available.
"""

import os
import sys

_GEN = os.path.join(os.path.dirname(__file__), "gen")
if _GEN not in sys.path:
    # protoc emits sibling imports (``import common_pb2``); expose the gen dir
    sys.path.insert(0, _GEN)
