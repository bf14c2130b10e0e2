import { defineConfig } from "vite";
import react from "@vitejs/plugin-react";

// Build into build/ (served directly by the aiohttp app's static fallback,
// service/app.py); dev server proxies API calls to the python service the
// same way the reference's CRA proxy pointed at :8080.
export default defineConfig({
  plugins: [react()],
  build: { outDir: "build", emptyOutDir: false },
  server: {
    proxy: {
      "/api": "http://localhost:8080",
      "/healthz": "http://localhost:8080",
    },
  },
});
