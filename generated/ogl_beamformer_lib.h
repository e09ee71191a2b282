/* ogl_beamforming_tpu client library — GENERATED from the Python
 * schema (ogl_beamforming_tpu/params); API-compatible with the
 * reference ogl_beamformer_lib surface. */
#ifndef OGL_BEAMFORMER_LIB_H
#define OGL_BEAMFORMER_LIB_H

#include <stdint.h>

#define BeamformerChunkChannelCount (16)
#define BeamformerFilterSlots (4)
#define BeamformerMaxBacklogFrames (4096)
#define BeamformerMaxChannelCount (256)
#define BeamformerMaxEmissionsCount (256)
#define BeamformerMaxComputeShaderStages (16)
#define BeamformerMaxParameterBlocks (16)
#define BeamformerMaxRawDataFramesInFlight (3)
#define BeamformerMaxHadamardElements (65536)

typedef enum {
	BeamformerShaderKind_Decode = 0,
	BeamformerShaderKind_Filter = 1,
	BeamformerShaderKind_Demodulate = 2,
	BeamformerShaderKind_DAS = 3,
	BeamformerShaderKind_Sum = 4,
	BeamformerShaderKind_MinMax = 5,
	BeamformerShaderKind_Hilbert = 6,
	BeamformerShaderKind_CoherencyWeighting = 7,
	BeamformerShaderKind_Reshape = 8,
	BeamformerShaderKind_RenderBeamformed = 9,
	BeamformerShaderKind_Count,
} BeamformerShaderKind;

typedef enum {
	BeamformerDataKind_Int16 = 0,
	BeamformerDataKind_Int16Complex = 1,
	BeamformerDataKind_Float32 = 2,
	BeamformerDataKind_Float32Complex = 3,
	BeamformerDataKind_Float16 = 4,
	BeamformerDataKind_Float16Complex = 5,
	BeamformerDataKind_Count,
} BeamformerDataKind;

typedef enum {
	BeamformerAcquisitionKind_FORCES = 0,
	BeamformerAcquisitionKind_UFORCES = 1,
	BeamformerAcquisitionKind_HERCULES = 2,
	BeamformerAcquisitionKind_RCA_VLS = 3,
	BeamformerAcquisitionKind_RCA_TPW = 4,
	BeamformerAcquisitionKind_UHERCULES = 5,
	BeamformerAcquisitionKind_RACES = 6,
	BeamformerAcquisitionKind_EPIC_FORCES = 7,
	BeamformerAcquisitionKind_EPIC_UFORCES = 8,
	BeamformerAcquisitionKind_EPIC_UHERCULES = 9,
	BeamformerAcquisitionKind_Flash = 10,
	BeamformerAcquisitionKind_HERO_PA = 11,
	BeamformerAcquisitionKind_ULM = 12,
	BeamformerAcquisitionKind_Count,
} BeamformerAcquisitionKind;

typedef enum {
	BeamformerDecodeMode_None = 0,
	BeamformerDecodeMode_Hadamard = 1,
	BeamformerDecodeMode_Walsh = 2,
	BeamformerDecodeMode_Count,
} BeamformerDecodeMode;

typedef enum {
	BeamformerSamplingMode_2X = 0,
	BeamformerSamplingMode_4X = 1,
	BeamformerSamplingMode_Count,
} BeamformerSamplingMode;

typedef enum {
	BeamformerContrastMode_None = 0,
	BeamformerContrastMode_A1S2 = 1,
	BeamformerContrastMode_Count,
} BeamformerContrastMode;

typedef enum {
	BeamformerEmissionKind_Sine = 0,
	BeamformerEmissionKind_Chirp = 1,
	BeamformerEmissionKind_Count,
} BeamformerEmissionKind;

typedef enum {
	BeamformerInterpolationMode_Nearest = 0,
	BeamformerInterpolationMode_Linear = 1,
	BeamformerInterpolationMode_Cubic = 2,
	BeamformerInterpolationMode_Count,
} BeamformerInterpolationMode;

typedef enum {
	BeamformerViewPlaneTag_XZ = 0,
	BeamformerViewPlaneTag_YZ = 1,
	BeamformerViewPlaneTag_XY = 2,
	BeamformerViewPlaneTag_Arbitrary = 3,
	BeamformerViewPlaneTag_Count,
} BeamformerViewPlaneTag;

typedef enum {
	BeamformerFilterKind_Kaiser = 0,
	BeamformerFilterKind_MatchedChirp = 1,
	BeamformerFilterKind_Count,
} BeamformerFilterKind;

typedef enum {
	BeamformerRCAOrientation_None = 0,
	BeamformerRCAOrientation_Rows = 1,
	BeamformerRCAOrientation_Columns = 2,
	BeamformerRCAOrientation_Count,
} BeamformerRCAOrientation;

typedef enum {
	BeamformerLibErrorKind_None = 0,
	BeamformerLibErrorKind_VersionMismatch = 1,
	BeamformerLibErrorKind_InvalidAccess = 2,
	BeamformerLibErrorKind_ParameterBlockOverflow = 3,
	BeamformerLibErrorKind_ParameterBlockUnallocated = 4,
	BeamformerLibErrorKind_ComputeStageOverflow = 5,
	BeamformerLibErrorKind_InvalidComputeStage = 6,
	BeamformerLibErrorKind_InvalidStartShader = 7,
	BeamformerLibErrorKind_InvalidDemodulationDataKind = 8,
	BeamformerLibErrorKind_InvalidImagePlane = 9,
	BeamformerLibErrorKind_InvalidFilterKind = 10,
	BeamformerLibErrorKind_InvalidDataKind = 11,
	BeamformerLibErrorKind_InvalidContrastMode = 12,
	BeamformerLibErrorKind_BufferOverflow = 13,
	BeamformerLibErrorKind_DataSizeMismatch = 14,
	BeamformerLibErrorKind_WorkQueueFull = 15,
	BeamformerLibErrorKind_ExportSpaceOverflow = 16,
	BeamformerLibErrorKind_SharedMemory = 17,
	BeamformerLibErrorKind_SyncVariable = 18,
	BeamformerLibErrorKind_FrameSizeOverflow = 19,
	BeamformerLibErrorKind_RFDataSizeOverflow = 20,
	BeamformerLibErrorKind_Count,
} BeamformerLibErrorKind;


typedef struct { float cycles; float frequency; } BeamformerSineParameters;
typedef struct { float duration; float min_frequency; float max_frequency; } BeamformerChirpParameters;

typedef struct {
	BeamformerEmissionKind kind;
	union {
		BeamformerSineParameters  sine;
		BeamformerChirpParameters chirp;
	};
} BeamformerEmissionParameters;

typedef struct { float cutoff_frequency; float beta; uint32_t length; } BeamformerKaiserFilterParameters;
typedef struct { float duration; float min_frequency; float max_frequency; } BeamformerMatchedChirpFilterParameters;

typedef struct {
	BeamformerFilterKind kind;
	float                sampling_frequency;
	uint32_t             complex;
	union {
		BeamformerKaiserFilterParameters       kaiser;
		BeamformerMatchedChirpFilterParameters matched_chirp;
	};
} BeamformerFilterParameters;

typedef struct {
	float    das_voxel_transform[16];  /* column major */
	float    xdc_transform[16];        /* column major */
	float    xdc_element_pitch[2];
	uint32_t raw_data_dimensions[2];
	float    focal_vector[2];          /* (degrees, meters); depth = INFINITY -> plane wave */
	uint32_t transmit_receive_orientation;
	uint32_t sample_count;
	uint32_t channel_count;
	uint32_t acquisition_count;
	BeamformerAcquisitionKind acquisition_kind;
	BeamformerDecodeMode      decode_mode;
	BeamformerSamplingMode    sampling_mode;
	float    time_offset;
	uint32_t single_focus;
	uint32_t single_orientation;
	int32_t  output_points[4];         /* (x, y, z, average_frames) */
	float    sampling_frequency;
	float    demodulation_frequency;
	float    speed_of_sound;
	float    f_number;
	BeamformerInterpolationMode interpolation_mode;
	uint32_t coherency_weighting;
	uint32_t decimation_rate;
	BeamformerContrastMode       contrast_mode;
	BeamformerEmissionParameters emission_parameters;
	uint32_t readi_group_count;
	uint32_t readi_group;
} BeamformerParameters;

typedef struct {
	BeamformerParameters parameters;
	int16_t  channel_mapping[BeamformerMaxChannelCount];
	int16_t  sparse_elements[BeamformerMaxEmissionsCount];
	uint8_t  transmit_receive_orientations[BeamformerMaxEmissionsCount];
	float    steering_angles[BeamformerMaxEmissionsCount];
	float    focal_depths[BeamformerMaxEmissionsCount];
	int32_t  compute_stages[BeamformerMaxComputeShaderStages];
	int32_t  compute_stage_parameters[BeamformerMaxComputeShaderStages];
	uint32_t compute_stages_count;
	BeamformerDataKind data_kind;
} BeamformerSimpleParameters;

typedef struct {
	uint32_t active;
	uint32_t save_enabled;
	uint32_t save_active;
	uint32_t acquisition_kind;
	uint64_t acquisition_kind_enabled_flags;
	float    transmit_power;
	float    image_plane_offsets[BeamformerViewPlaneTag_Count];
	float    tgc_control_points[8];
	int32_t  save_name_tag_length;
	uint8_t  save_name_tag[128];
} BeamformerLiveImagingParameters;

typedef struct {
	int32_t shader_ids[16];
	float   times[32][16];
	float   rf_time_deltas[32];
} BeamformerComputeStatsTable;


uint32_t beamformer_get_api_version(void);
int32_t  beamformer_get_last_error(void);
const char *beamformer_get_last_error_string(void);
const char *beamformer_error_string(int32_t kind);
void     beamformer_set_global_timeout(uint32_t timeout_ms);

uint64_t beamformer_maximum_frames_for_parameters(BeamformerParameters *);
uint64_t beamformer_maximum_frames_for_simple_parameters(BeamformerSimpleParameters *);
uint64_t beamformer_maximum_rf_data_size(void);

uint32_t beamformer_beamform_data(BeamformerSimpleParameters *bp, void *data,
                                  uint32_t data_size, void *out_data,
                                  int32_t timeout_ms);

uint32_t beamformer_push_data_with_compute(void *data, uint32_t size,
                                           uint32_t image_plane_tag,
                                           uint32_t parameter_slot);
uint32_t beamformer_get_last_frames(void *out_data, uint64_t out_data_size,
                                    uint32_t count);
uint32_t beamformer_compute_timings(BeamformerComputeStatsTable *out,
                                    int32_t timeout_ms);

uint32_t beamformer_reserve_parameter_blocks(uint32_t count);
uint32_t beamformer_set_pipeline_stage_parameters(uint32_t stage_index, int32_t parameter);
uint32_t beamformer_set_pipeline_stage_parameters_at(uint32_t stage_index, int32_t parameter, uint32_t parameter_slot);
uint32_t beamformer_push_pipeline(int32_t *shaders, uint32_t shader_count, uint32_t data_kind);
uint32_t beamformer_push_pipeline_at(int32_t *shaders, uint32_t shader_count, uint32_t data_kind, uint32_t parameter_slot);
uint32_t beamformer_push_simple_parameters(BeamformerSimpleParameters *);
uint32_t beamformer_push_simple_parameters_at(BeamformerSimpleParameters *, uint32_t parameter_slot);
uint32_t beamformer_push_parameters(BeamformerParameters *);
uint32_t beamformer_push_parameters_at(BeamformerParameters *, uint32_t parameter_slot);
uint32_t beamformer_push_channel_mapping(int16_t *mapping, uint32_t count);
uint32_t beamformer_push_channel_mapping_at(int16_t *mapping, uint32_t count, uint32_t parameter_slot);
uint32_t beamformer_push_sparse_elements(int16_t *elements, uint32_t count);
uint32_t beamformer_push_sparse_elements_at(int16_t *elements, uint32_t count, uint32_t parameter_slot);
uint32_t beamformer_push_focal_vectors(float *vectors, uint32_t count);
uint32_t beamformer_push_focal_vectors_at(float *vectors, uint32_t count, uint32_t parameter_slot);
uint32_t beamformer_push_transmit_receive_orientations(uint8_t *values, uint32_t count);
uint32_t beamformer_push_transmit_receive_orientations_at(uint8_t *values, uint32_t count, uint32_t parameter_slot);
uint32_t beamformer_create_filter(BeamformerFilterParameters *filter,
                                  uint8_t filter_slot, uint8_t parameter_block);

int32_t  beamformer_live_parameters_get_dirty_flag(void);
uint32_t beamformer_set_live_parameters(BeamformerLiveImagingParameters *);
BeamformerLiveImagingParameters *beamformer_get_live_parameters(void);

#endif /* OGL_BEAMFORMER_LIB_H */