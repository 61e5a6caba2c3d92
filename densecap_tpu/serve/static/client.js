// Webcam client loop: grab frame -> POST -> draw. Paced by server
// latency like the reference client (web-client.js:36-45) — no timers,
// the next frame goes out when the previous response lands.
(function () {
  var video = document.getElementById('cam');
  var canvas = document.getElementById('view');
  var ctx = canvas.getContext('2d');
  var stats = document.getElementById('stats');
  var grab = document.createElement('canvas');
  var gctx = grab.getContext('2d');
  grab.width = 640; grab.height = 480;

  var PALETTE = [
    '#ad2323', '#2a4bd7', '#1d6914', '#814a19', '#8126c0',
    '#81c57a', '#9dafff', '#29d0d0', '#ff9233', '#ffee33',
    '#e9debb', '#ffcdf3', '#575757', '#a0a0a0'
  ];

  var lastAnnotations = null;
  var t0 = 0, ema = 0;

  function draw() {
    ctx.drawImage(video, 0, 0, canvas.width, canvas.height);
    if (lastAnnotations) {
      var sx = canvas.width / grab.width, sy = canvas.height / grab.height;
      var a = lastAnnotations;
      for (var i = 0; i < a.boxes.length; i++) {
        var b = a.boxes[i];
        var color = PALETTE[(a.ids ? a.ids[i] : i) % PALETTE.length];
        ctx.strokeStyle = color; ctx.lineWidth = 2;
        ctx.strokeRect((b[0] - 1) * sx, (b[1] - 1) * sy, b[2] * sx, b[3] * sy);
        var cap = a.captions[i];
        if (cap) {
          ctx.font = '13px sans-serif';
          var tw = ctx.measureText(cap).width;
          ctx.fillStyle = color;
          ctx.fillRect((b[0] - 1) * sx, (b[1] - 1) * sy - 16, tw + 6, 16);
          ctx.fillStyle = '#fff';
          ctx.fillText(cap, (b[0] - 1) * sx + 3, (b[1] - 1) * sy - 4);
        }
      }
    }
    requestAnimationFrame(draw);
  }

  // per-page-load smoothing stream: the server keys its temporal
  // smoother on this, so several open clients track ids independently
  var streamId = 'web-' + Math.random().toString(36).slice(2, 10);

  function pump() {
    gctx.drawImage(video, 0, 0, grab.width, grab.height);
    var dataURL = grab.toDataURL('image/jpeg', 0.7);
    t0 = performance.now();
    fetch('/api/infer', {
      method: 'POST',
      headers: { 'Content-Type': 'application/json' },
      body: JSON.stringify({ image: dataURL, stream: streamId })
    }).then(function (r) { return r.json(); })
      .then(function (res) {
        if (!res.error) {
          lastAnnotations = res;
          var dt = performance.now() - t0;
          ema = ema ? 0.9 * ema + 0.1 * dt : dt;
          stats.textContent = (1000 / ema).toFixed(1) + ' fps (' +
            ema.toFixed(0) + ' ms/frame), ' + res.boxes.length + ' regions';
        } else {
          stats.textContent = 'server error: ' + res.error;
        }
        pump();
      })
      .catch(function (e) {
        stats.textContent = 'request failed: ' + e;
        setTimeout(pump, 1000);
      });
  }

  navigator.mediaDevices.getUserMedia({ video: true }).then(function (s) {
    video.srcObject = s;
    video.onloadedmetadata = function () { draw(); pump(); };
  }).catch(function (e) {
    stats.textContent = 'webcam unavailable: ' + e;
  });
})();
