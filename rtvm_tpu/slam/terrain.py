"""Terrain / soil analyzer — TPU-native rebuild of reference TerrainSoilAnalyzer
(slam.py:751-1426): 8-type soil classification from color statistics, moisture index,
vegetation cover with an NDVI-style estimate, surface texture/roughness classes,
erosion risk, agronomic recommendations, a side-panel visualization and a text report.

All image-wide statistics (HSV histogramming, masks, gradient energies) are computed
in one jitted JAX function; classification/report logic runs host-side on the scalar
summary. Scoring tables are this framework's own design with the same capability
surface as the reference's hand-tuned tables.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from rtvm_tpu.ops import color, filters

# Soil knowledge table: hue/value/saturation prototypes + agronomic properties.
SOIL_TYPES: Dict[str, dict] = {
    "чернозём": dict(hue=15, sat=80, val=60, fertility="очень высокая", ph="6.5-7.5",
                     crops=["пшеница", "кукуруза", "подсолнечник"]),
    "суглинок": dict(hue=18, sat=90, val=110, fertility="высокая", ph="6.0-7.0",
                     crops=["овощи", "зерновые", "плодовые"]),
    "глина": dict(hue=10, sat=120, val=100, fertility="средняя", ph="7.0-8.0",
                  crops=["рис", "капуста", "свёкла"]),
    "песок": dict(hue=25, sat=60, val=180, fertility="низкая", ph="5.5-6.5",
                  crops=["картофель", "морковь", "арахис"]),
    "супесь": dict(hue=22, sat=70, val=150, fertility="средняя", ph="5.5-7.0",
                   crops=["рожь", "овёс", "люпин"]),
    "торф": dict(hue=12, sat=100, val=45, fertility="высокая", ph="4.0-5.5",
                 crops=["ягодные", "овощи", "зелень"]),
    "каменистая почва": dict(hue=20, sat=30, val=130, fertility="очень низкая", ph="6.0-8.0",
                             crops=["виноград", "лаванда", "травы"]),
    "солончак": dict(hue=24, sat=25, val=200, fertility="очень низкая", ph="8.0-9.5",
                     crops=["солеустойчивые травы"]),
}


@jax.jit
def _image_stats(img: jnp.ndarray):
    """One pass over a [H, W, 3] BGR image -> scalar statistics dict (all jnp)."""
    imgf = img.astype(jnp.float32)
    hsv = color.bgr2hsv(imgf)
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    b, g, r = imgf[..., 0], imgf[..., 1], imgf[..., 2]
    gray = color.bgr2gray(imgf)

    green_mask = (h >= 35) & (h <= 85) & (s > 40) & (v > 40)
    dry_veg_mask = (h >= 15) & (h <= 35) & (s > 40) & (v > 90) & (g > b)
    # NDVI-style proxy from RGB: (G - R) / (G + R)
    ndvi = (g - r) / jnp.maximum(g + r, 1.0)

    gx, gy = filters.sobel(gray)
    grad_mag = jnp.sqrt(gx * gx + gy * gy)
    lap = (
        jnp.roll(gray, 1, 0) + jnp.roll(gray, -1, 0) + jnp.roll(gray, 1, 1)
        + jnp.roll(gray, -1, 1) - 4 * gray
    )

    soil_mask = ~green_mask  # bare-ground pixels for soil color stats
    w = soil_mask.astype(jnp.float32)
    wsum = jnp.maximum(w.sum(), 1.0)

    # directional gradient anisotropy as an erosion-channel indicator
    aniso = jnp.abs(jnp.abs(gx).mean() - jnp.abs(gy).mean()) / jnp.maximum(
        grad_mag.mean(), 1e-3
    )

    return {
        "hue_mean": (h * w).sum() / wsum,
        "sat_mean": (s * w).sum() / wsum,
        "val_mean": (v * w).sum() / wsum,
        "val_std": jnp.sqrt(jnp.maximum(((v - (v * w).sum() / wsum) ** 2 * w).sum() / wsum, 0.0)),
        "green_frac": green_mask.mean(),
        "dry_veg_frac": dry_veg_mask.mean(),
        "ndvi_mean": (ndvi * green_mask).sum() / jnp.maximum(green_mask.sum(), 1.0),
        "darkness": 1.0 - (v * w).sum() / wsum / 255.0,
        "grad_mean": grad_mag.mean(),
        "lap_var": jnp.var(lap),
        "low_sat_frac": ((s < 30) & soil_mask).sum() / wsum,
        "bright_frac": ((v > 200) & soil_mask).sum() / wsum,
        "gradient_anisotropy": aniso,
    }


class TerrainSoilAnalyzer:
    def analyze_image(self, image_bgr: np.ndarray) -> dict:
        stats = {k: float(v) for k, v in _image_stats(jnp.asarray(image_bgr)).items()}

        # --- soil type scoring (reference slam.py:913-991 capability) ---
        scores = {}
        for name, proto in SOIL_TYPES.items():
            dh = abs(stats["hue_mean"] - proto["hue"]) / 30.0
            ds = abs(stats["sat_mean"] - proto["sat"]) / 120.0
            dv = abs(stats["val_mean"] - proto["val"]) / 150.0
            scores[name] = max(0.0, 1.0 - (0.4 * dh + 0.3 * ds + 0.3 * dv))
        # special gates
        if stats["bright_frac"] > 0.3 and stats["low_sat_frac"] > 0.4:
            scores["солончак"] += 0.3
        if stats["darkness"] > 0.7:
            scores["торф"] += 0.2
            scores["чернозём"] += 0.2
        soil_type = max(scores, key=scores.get)
        confidence = float(np.clip(scores[soil_type], 0.0, 1.0))

        # --- moisture (slam.py:993-1039): darker + more saturated = wetter ---
        moisture = float(np.clip(0.6 * stats["darkness"] + 0.4 * (stats["sat_mean"] / 255.0), 0, 1))
        moisture_class = (
            "высокая" if moisture > 0.6 else "средняя" if moisture > 0.35 else "низкая"
        )

        # --- vegetation (slam.py:1041-1094) ---
        veg = stats["green_frac"]
        veg_class = "густая" if veg > 0.5 else "умеренная" if veg > 0.2 else "редкая"

        # --- texture/roughness (slam.py:1096-1145) ---
        rough = stats["grad_mean"]
        texture_class = (
            "крупнозернистая" if rough > 40 else "среднезернистая" if rough > 15 else "мелкозернистая"
        )

        # --- erosion risk (slam.py:1147-1203): channels + variance + bare bright soil ---
        erosion_score = (
            0.5 * min(stats["gradient_anisotropy"] * 2.0, 1.0)
            + 0.3 * min(stats["val_std"] / 80.0, 1.0)
            + 0.2 * min(stats["low_sat_frac"] * 2.0, 1.0)
        ) * (1.0 - 0.5 * veg)
        erosion_class = (
            "высокий" if erosion_score > 0.55 else "средний" if erosion_score > 0.3 else "низкий"
        )

        result = {
            "soil_type": soil_type,
            "confidence": confidence,
            "properties": SOIL_TYPES[soil_type],
            "moisture": moisture,
            "moisture_class": moisture_class,
            "vegetation_cover": veg,
            "vegetation_class": veg_class,
            "dry_vegetation": stats["dry_veg_frac"],
            "ndvi_estimate": stats["ndvi_mean"],
            "texture_class": texture_class,
            "roughness": rough,
            "erosion_risk": erosion_score,
            "erosion_class": erosion_class,
            "stats": stats,
        }
        result["recommendations"] = self._recommendations(result)
        return result

    @staticmethod
    def _recommendations(r: dict) -> list:
        """Agronomic recommendations (reference slam.py:1205-1251 capability)."""
        rec = []
        if r["moisture"] < 0.35:
            rec.append("Требуется орошение: влажность почвы низкая")
        if r["moisture"] > 0.7:
            rec.append("Проверить дренаж: возможное переувлажнение")
        if r["erosion_class"] == "высокий":
            rec.append("Противоэрозионные меры: террасирование, посев многолетних трав")
        if r["vegetation_cover"] < 0.2:
            rec.append("Низкий растительный покров: рассмотреть сидераты")
        props = r["properties"]
        rec.append(f"Рекомендуемые культуры: {', '.join(props['crops'])}")
        if props["fertility"] in ("низкая", "очень низкая"):
            rec.append("Внести органические удобрения для повышения плодородия")
        return rec

    def visualize(self, image_bgr: np.ndarray, result: dict) -> np.ndarray:
        """Side-panel visualization (reference slam.py:1253-1346)."""
        import cv2

        h, w = image_bgr.shape[:2]
        panel_w = 360
        out = np.zeros((h, w + panel_w, 3), np.uint8)
        out[:, :w] = image_bgr
        out[:, w:] = (35, 35, 35)
        lines = [
            f"Тип почвы: {result['soil_type']} ({result['confidence']:.2f})",
            f"Плодородие: {result['properties']['fertility']}",
            f"pH: {result['properties']['ph']}",
            f"Влажность: {result['moisture_class']} ({result['moisture']:.2f})",
            f"Растительность: {result['vegetation_class']} ({result['vegetation_cover']*100:.0f}%)",
            f"NDVI (оценка): {result['ndvi_estimate']:.2f}",
            f"Текстура: {result['texture_class']}",
            f"Риск эрозии: {result['erosion_class']} ({result['erosion_risk']:.2f})",
        ]
        from rtvm_tpu.navigate.mapping import _put_text

        y = 30
        for ln in lines:
            _put_text(out, ln, (w + 12, y), (220, 220, 220), size=15)
            y += 26
        y += 10
        for rec in result["recommendations"]:
            _put_text(out, "- " + rec, (w + 12, y), (120, 220, 120), size=13)
            y += 40
        return out

    def report(self, result: dict) -> str:
        """Text report (reference slam.py:1348-1426)."""
        p = result["properties"]
        lines = [
            "=" * 50,
            "ОТЧЁТ ОБ АНАЛИЗЕ ПОЧВЫ И РЕЛЬЕФА",
            "=" * 50,
            f"Тип почвы: {result['soil_type']} (уверенность {result['confidence']:.2f})",
            f"  Плодородие: {p['fertility']}",
            f"  pH: {p['ph']}",
            f"Влажность: {result['moisture_class']} ({result['moisture']:.2f})",
            f"Растительный покров: {result['vegetation_class']} "
            f"({result['vegetation_cover']*100:.1f}%), NDVI~{result['ndvi_estimate']:.2f}",
            f"Текстура поверхности: {result['texture_class']} "
            f"(шероховатость {result['roughness']:.1f})",
            f"Риск эрозии: {result['erosion_class']} ({result['erosion_risk']:.2f})",
            "",
            "Рекомендации:",
        ]
        lines += [f"  * {r}" for r in result["recommendations"]]
        lines.append("=" * 50)
        return "\n".join(lines)
