/* VAD oracle: runs the reference's vendored WebRTC VAD over a raw int16
 * file and dumps per-frame golden data for parity testing:
 *
 *   decisions.u8   [n_frames]      0/1 classify results
 *   features.i16   [n_frames x 7]  6 log-energy features + total_power
 *                                  (computed on a cloned instance so the
 *                                  live state machine is undisturbed)
 *
 * Usage: vad_oracle <rawfile> <rate> <mode> <frame_ms> <outdir>
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <soundswallower/vad.h>

#include "common_audio/vad/vad_core.h"
#include "common_audio/vad/vad_filterbank.h"
#include "common_audio/vad/vad_sp.h"

int main(int argc, char *argv[]) {
    const char *rawfile, *outdir;
    int rate, mode;
    double frame_ms;
    vad_t *vad;
    FILE *fh, *dec, *feat;
    char path[4096];
    short *data;
    long len, pos;
    size_t frame_size;

    if (argc != 6) {
        fprintf(stderr, "usage: %s <rawfile> <rate> <mode> <frame_ms> <outdir>\n",
                argv[0]);
        return 1;
    }
    rawfile = argv[1];
    rate = atoi(argv[2]);
    mode = atoi(argv[3]);
    frame_ms = atof(argv[4]);
    outdir = argv[5];

    fh = fopen(rawfile, "rb");
    if (fh == NULL) { perror(rawfile); return 1; }
    fseek(fh, 0, SEEK_END);
    len = ftell(fh) / 2;
    fseek(fh, 0, SEEK_SET);
    data = malloc(len * 2);
    if (fread(data, 2, len, fh) != (size_t)len) { perror("read"); return 1; }
    fclose(fh);

    vad = vad_init((vad_mode_t)mode, rate, frame_ms / 1000.0);
    if (vad == NULL) { fprintf(stderr, "vad_init failed\n"); return 1; }
    frame_size = vad_frame_size(vad);

    snprintf(path, sizeof(path), "%s/decisions.u8", outdir);
    dec = fopen(path, "wb");
    snprintf(path, sizeof(path), "%s/features.i16", outdir);
    feat = fopen(path, "wb");

    for (pos = 0; pos + (long)frame_size <= len; pos += frame_size) {
        /* feature dump on a cloned core instance (classify advances the
         * real one identically right after) */
        VadInstT clone;
        int16_t features[7];
        int16_t nb[240];
        size_t nb_len = frame_size;
        unsigned char r;
        memcpy(&clone, vad, sizeof(VadInstT)); /* vad_t starts with VadInstT */
        if (rate == 48000) {
            int32_t tmp_mem[480 + 256] = { 0 };
            size_t i, n10 = frame_size / 480;
            for (i = 0; i < n10; i++)
                WebRtcSpl_Resample48khzTo8khz(data + pos + i * 480,
                                              nb + i * 80,
                                              &clone.state_48_to_8, tmp_mem);
            nb_len = frame_size / 6;
        } else if (rate == 32000) {
            int16_t wb[480];
            WebRtcVad_Downsampling(data + pos, wb,
                                   &clone.downsampling_filter_states[2],
                                   frame_size);
            WebRtcVad_Downsampling(wb, nb, clone.downsampling_filter_states,
                                   frame_size / 2);
            nb_len = frame_size / 4;
        } else if (rate == 16000) {
            WebRtcVad_Downsampling(data + pos, nb,
                                   clone.downsampling_filter_states,
                                   frame_size);
            nb_len = frame_size / 2;
        } else {
            memcpy(nb, data + pos, frame_size * 2);
        }
        features[6] = WebRtcVad_CalculateFeatures(&clone, nb, nb_len, features);
        fwrite(features, 2, 7, feat);

        r = (unsigned char)vad_classify(vad, data + pos);
        fwrite(&r, 1, 1, dec);
    }
    fclose(dec);
    fclose(feat);
    vad_free(vad);
    free(data);
    return 0;
}
