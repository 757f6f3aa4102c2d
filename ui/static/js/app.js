// Web frontend: upload -> start -> poll /progress -> render /results cards.
// Counterpart of the reference app.js flow with working progress (the backend
// reports structured progress instead of scraping subprocess stdout).

const $ = (id) => document.getElementById(id);
let pollTimer = null;

$("video-input").addEventListener("change", async (e) => {
  const file = e.target.files[0];
  if (!file) return;
  $("upload-status").textContent = "загрузка…";
  const form = new FormData();
  form.append("video", file);
  const res = await fetch("/upload", { method: "POST", body: form });
  const data = await res.json();
  if (data.ok) {
    $("upload-status").textContent = `загружено: ${data.path}`;
    $("start-btn").disabled = false;
  } else {
    $("upload-status").textContent = `ошибка: ${data.error || res.status}`;
  }
});

$("start-btn").addEventListener("click", async () => {
  $("start-btn").disabled = true;
  await fetch("/start", { method: "POST" });
  pollTimer = setInterval(poll, 1000);
});

async function poll() {
  const res = await fetch("/progress");
  const p = await res.json();
  $("progress-fill").style.width = `${p.percent || 0}%`;
  $("progress-text").textContent =
    p.state === "running" ? `кадр ${p.frame} (${(p.percent || 0).toFixed(1)}%)`
    : p.state === "done" ? "готово"
    : p.state === "error" ? `ошибка: ${p.error}` : p.state;
  if (p.state === "done" || p.state === "error") {
    clearInterval(pollTimer);
    $("start-btn").disabled = false;
    if (p.state === "done") loadResults();
  }
}

async function loadResults() {
  const res = await fetch("/results");
  const data = await res.json();
  const grid = $("results-grid");
  grid.innerHTML = "";
  for (const [name, url] of Object.entries(data.files)) {
    const card = document.createElement("div");
    card.className = "result-card";
    card.innerHTML = `<img src="${url}" alt="${name}"><div>${name}
      <a href="${url}" download>скачать</a></div>`;
    card.querySelector("img").addEventListener("click", () => {
      $("modal-img").src = url;
      $("modal").classList.remove("hidden");
    });
    grid.appendChild(card);
  }
}

$("modal-close").addEventListener("click", () => $("modal").classList.add("hidden"));
$("theme-toggle").addEventListener("click", () => {
  const dark = document.body.classList.toggle("dark");
  localStorage.setItem("theme", dark ? "dark" : "light");
});
if (localStorage.getItem("theme") === "dark") document.body.classList.add("dark");
