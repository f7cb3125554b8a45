"""In-process fake CVAT server for protocol tests.

Implements the REST surface the client touches (SURVEY.md §4: "fake CVAT
server fixture ... serving the three GET endpoints /tasks/{id},
/tasks/{id}/data/meta, /tasks/{id}/annotations and asserting on the PATCH
bodies"), for both api/v1 and api path prefixes, and records every PATCH/POST
body for assertions.
"""
from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List


class FakeCvatState:
    def __init__(self):
        self.tasks: Dict[int, dict] = {}
        self.projects: Dict[int, dict] = {}
        self.patches: List[dict] = []   # {path, body}
        self.posts: List[dict] = []

    def add_task(self, task_id: int, name: str, labels, frames,
                 shapes=None, tracks=None, project_id: int = 1,
                 data_location: int = 7):
        self.tasks[task_id] = {
            "meta": {"id": task_id, "name": name, "labels": labels,
                     "project_id": project_id, "data": data_location},
            "frames": [{"name": f} for f in frames],
            "annotations": {"shapes": shapes or [], "tracks": tracks or []},
        }
        self.projects.setdefault(
            project_id, {"id": project_id, "name": f"project{project_id}",
                         "labels": list(labels)})


def make_handler(state: FakeCvatState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _send(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _path(self):
            # Accept both /api/v1/... and /api/...
            path = self.path.split("?")[0]
            return re.sub(r"^/api(/v1)?/", "", path)

        def do_GET(self):
            p = self._path()
            m = re.fullmatch(r"tasks/(\d+)", p)
            if m:
                task = state.tasks.get(int(m.group(1)))
                return self._send(task["meta"] if task else {}, 200 if task
                                  else 404)
            m = re.fullmatch(r"tasks/(\d+)/data/meta", p)
            if m:
                task = state.tasks[int(m.group(1))]
                return self._send({"frames": task["frames"]})
            m = re.fullmatch(r"tasks/(\d+)/annotations", p)
            if m:
                return self._send(state.tasks[int(m.group(1))]["annotations"])
            m = re.fullmatch(r"projects/(\d+)", p)
            if m:
                return self._send(state.projects[int(m.group(1))])
            if p == "projects":
                return self._send({"results": [
                    {"id": k, "name": v["name"]}
                    for k, v in state.projects.items()]})
            self._send({"error": p}, 404)

        def do_PATCH(self):
            length = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(length) or b"{}")
            state.patches.append({"path": self.path, "body": body})
            p = self._path()
            m = re.fullmatch(r"projects/(\d+)", p)
            if m and "labels" in body:
                proj = state.projects[int(m.group(1))]
                next_id = 1 + max(
                    [l["id"] for l in proj["labels"]] or [0])
                for label in body["labels"]:
                    if "id" not in label:
                        label = dict(label, id=next_id)
                        next_id += 1
                    proj["labels"].append(label)
                # Task labels mirror project labels.
                for task in state.tasks.values():
                    if task["meta"]["project_id"] == int(m.group(1)):
                        task["meta"]["labels"] = proj["labels"]
            self._send({"ok": True})

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(length) or b"{}")
            state.posts.append({"path": self.path, "body": body})
            if re.fullmatch(r"tasks", self._path()):
                new_id = 1 + max(list(state.tasks) or [0])
                state.add_task(new_id, body.get("name", "task"),
                               [], [], project_id=body.get("project_id", 1))
                return self._send({"id": new_id})
            self._send({"ok": True})

    return Handler


class FakeCvatServer:
    """Context manager running the fake server on an ephemeral port."""

    def __init__(self, state: FakeCvatState):
        self.state = state
        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                         make_handler(state))
        self.thread = threading.Thread(target=self.httpd.serve_forever,
                                       daemon=True)

    @property
    def url(self) -> str:
        host, port = self.httpd.server_address
        return f"http://{host}:{port}"

    def __enter__(self):
        self.thread.start()
        return self

    def __exit__(self, *exc):
        self.httpd.shutdown()
        self.httpd.server_close()
