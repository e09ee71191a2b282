classdef OGLBeamformerSimpleParameters
properties
	das_voxel_transform (1,16) single = zeros(1,16,'single');
	xdc_transform (1,16) single = single(reshape(eye(4),1,16));
	xdc_element_pitch (1,2) single = zeros(1,2,'single');
	raw_data_dimensions (1,2) uint32 = zeros(1,2,'uint32');
	focal_vector (1,2) single = zeros(1,2,'single');
	transmit_receive_orientation (1,1) uint32 = 0;
	sample_count (1,1) uint32 = 0;
	channel_count (1,1) uint32 = 0;
	acquisition_count (1,1) uint32 = 0;
	acquisition_kind (1,1) uint32 = 0;
	decode_mode (1,1) uint32 = 1;
	sampling_mode (1,1) uint32 = 0;
	time_offset (1,1) single = 0;
	single_focus (1,1) uint32 = 1;
	single_orientation (1,1) uint32 = 1;
	output_points (1,4) int32 = zeros(1,4,'int32');
	sampling_frequency (1,1) single = 0;
	demodulation_frequency (1,1) single = 0;
	speed_of_sound (1,1) single = 1540;
	f_number (1,1) single = 1;
	interpolation_mode (1,1) uint32 = 1;
	coherency_weighting (1,1) uint32 = 0;
	decimation_rate (1,1) uint32 = 1;
	contrast_mode (1,1) uint32 = 0;
	emission_kind (1,1) uint32 = 0;
	emission_parameters (1,3) single = zeros(1,3,'single');
	readi_group_count (1,1) uint32 = 0;
	readi_group (1,1) uint32 = 0;
	channel_mapping (1,256) int16 = int16(0:255);
	sparse_elements (1,256) int16 = zeros(1,256,'int16');
	transmit_receive_orientations (1,256) uint8 = zeros(1,256,'uint8');
	steering_angles (1,256) single = zeros(1,256,'single');
	focal_depths (1,256) single = zeros(1,256,'single');
	compute_stages (1,16) int32 = zeros(1,16,'int32');
	compute_stage_parameters (1,16) int32 = zeros(1,16,'int32');
	compute_stages_count (1,1) uint32 = 0;
	data_kind (1,1) uint32 = 0;
end
methods
	function bytes = serialize(obj)
		% Packs fields in BeamformerSimpleParameters layout.
		bytes = [];
		bytes = [bytes, typecast(obj.das_voxel_transform, 'uint8')];
		bytes = [bytes, typecast(obj.xdc_transform, 'uint8')];
		bytes = [bytes, typecast(obj.xdc_element_pitch, 'uint8')];
		bytes = [bytes, typecast(obj.raw_data_dimensions, 'uint8')];
		bytes = [bytes, typecast(obj.focal_vector, 'uint8')];
		bytes = [bytes, typecast(obj.transmit_receive_orientation, 'uint8')];
		bytes = [bytes, typecast(obj.sample_count, 'uint8')];
		bytes = [bytes, typecast(obj.channel_count, 'uint8')];
		bytes = [bytes, typecast(obj.acquisition_count, 'uint8')];
		bytes = [bytes, typecast(obj.acquisition_kind, 'uint8')];
		bytes = [bytes, typecast(obj.decode_mode, 'uint8')];
		bytes = [bytes, typecast(obj.sampling_mode, 'uint8')];
		bytes = [bytes, typecast(obj.time_offset, 'uint8')];
		bytes = [bytes, typecast(obj.single_focus, 'uint8')];
		bytes = [bytes, typecast(obj.single_orientation, 'uint8')];
		bytes = [bytes, typecast(obj.output_points, 'uint8')];
		bytes = [bytes, typecast(obj.sampling_frequency, 'uint8')];
		bytes = [bytes, typecast(obj.demodulation_frequency, 'uint8')];
		bytes = [bytes, typecast(obj.speed_of_sound, 'uint8')];
		bytes = [bytes, typecast(obj.f_number, 'uint8')];
		bytes = [bytes, typecast(obj.interpolation_mode, 'uint8')];
		bytes = [bytes, typecast(obj.coherency_weighting, 'uint8')];
		bytes = [bytes, typecast(obj.decimation_rate, 'uint8')];
		bytes = [bytes, typecast(obj.contrast_mode, 'uint8')];
		bytes = [bytes, typecast(obj.emission_kind, 'uint8')];
		bytes = [bytes, typecast(obj.emission_parameters, 'uint8')];
		bytes = [bytes, typecast(obj.readi_group_count, 'uint8')];
		bytes = [bytes, typecast(obj.readi_group, 'uint8')];
		bytes = [bytes, typecast(obj.channel_mapping, 'uint8')];
		bytes = [bytes, typecast(obj.sparse_elements, 'uint8')];
		bytes = [bytes, typecast(obj.transmit_receive_orientations, 'uint8')];
		bytes = [bytes, typecast(obj.steering_angles, 'uint8')];
		bytes = [bytes, typecast(obj.focal_depths, 'uint8')];
		bytes = [bytes, typecast(obj.compute_stages, 'uint8')];
		bytes = [bytes, typecast(obj.compute_stage_parameters, 'uint8')];
		bytes = [bytes, typecast(obj.compute_stages_count, 'uint8')];
		bytes = [bytes, typecast(obj.data_kind, 'uint8')];
	end
end
end